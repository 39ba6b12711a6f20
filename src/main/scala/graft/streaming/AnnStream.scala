package graft.streaming

import graft.functions.Vectors
import graft.queries.Ann
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ANN serving (the continuous-retrieval form of
  * `ann_lsh_bucket`): query vectors arrive on a stream and each is
  * answered with its exact-cosine top-k over a STANDING reference
  * corpus, probing only the query's LSH buckets — the "retrieve
  * nearest training examples for this incoming sample" path an online
  * pipeline serves, with the same multi-table multiprobe blocking and
  * the same results as the batch operator.
  *
  * Spark-first: the reference side is a static (re-broadcastable)
  * bucket index — the SAME (tbl, bucket) layout the batch operator
  * derives per run, built once here — so candidate generation is a
  * stateless stream-static equi-join on the bucket key; the per-query
  * top-k runs in `flatMapGroupsWithState` keyed by query id. The
  * group handler is STATELESS by design (every query is fully
  * answered within its arrival micro-batch; fMGWS is used only
  * because plain flatMapGroups is not allowed on a stream) and its
  * buffer is the query's LSH candidate set — bounded by
  * tables·probes·bucket-occupancy, the same bound the batch join
  * carries, never the corpus.
  *
  * Parity: quantized-integer cosine end-to-end, `ref_id =!= qid`
  * self-exclusion, (cos DESC, id ASC) ranking — a stream fed the
  * batch operator's query set must produce ITS EXACT rows
  * (spec-gated).
  */
object AnnStream {

  case class Scored(qid: Long, nid: Long, rank: Int, cos: Double)

  /** The standing reference index: one (ref_id, qv, n2, tbl, bucket)
    * row per vector per LSH table. Build once, persist, reuse every
    * micro-batch; at billions of vectors this is the bucketed-table
    * layout (equi-join on (tbl, bucket) stays storage-partitioned). */
  def referenceIndex(reference: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(reference.sparkSession)
    reference
      .select(col("vec_id"), Vectors.quantize(col("embedding")).as("qv"))
      .withColumn("n2", Vectors.dot(col("qv"), col("qv")))
      .filter(col("n2") > 0)
      .select(col("vec_id").as("ref_id"), col("qv").as("ref_qv"),
        col("n2").as("ref_n2"),
        posexplode(Vectors.signBucketsInt(col("qv"),
          Ann.NumTables * Ann.NumPlanes, Ann.Dims)).as(Seq("tbl", "bucket")))
  }

  /** Exact-cosine top-k per streaming query vector, candidates from
    * the query's own bucket and all hamming≤`ProbeDist` neighbors in
    * every table. `stream` needs (vec_id, embedding); emits
    * [[Scored]] rows append-only as each query's batch completes.
    * Zero-norm queries (cosine undefined) emit nothing. */
  def topkContinuous(stream: DataFrame, refIndex: DataFrame,
                     k: Int = Ann.TopK): Dataset[Scored] = {
    graft.plans.GraftExtensions.ensureRegistered(stream.sparkSession)
    val probed = stream
      .select(col("vec_id").as("qid"), Vectors.quantize(col("embedding")).as("qqv"))
      .withColumn("qn2", Vectors.dot(col("qqv"), col("qqv")))
      .filter(col("qn2") > 0)
      .select(col("qid"), col("qqv"), col("qn2"),
        posexplode(Vectors.signBucketsInt(col("qqv"),
          Ann.NumTables * Ann.NumPlanes, Ann.Dims)).as(Seq("tbl", "qbucket")))
      .withColumn("probe", explode(
        Vectors.hammingProbesInt(col("qbucket"), Ann.NumPlanes, Ann.ProbeDist)))
    val scored = probed.join(refIndex,
        probed("tbl") === refIndex("tbl") && col("probe") === col("bucket") &&
          col("ref_id") =!= col("qid"))
      .select(col("qid"), col("ref_id"),
        Vectors.cosine(Vectors.dot(col("qqv"), col("ref_qv")),
          col("qn2"), col("ref_n2")).as("cos"))

    implicit val se: org.apache.spark.sql.Encoder[Scored] = Encoders.product[Scored]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val te: org.apache.spark.sql.Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        topk(k))
  }

  /** Per-query handler: dedupe the multiprobe hits by ref_id (the
    * same pair may arrive through several tables/probes — identical
    * cos, so any survivor is correct), rank (cos DESC, id ASC), keep
    * k. Buffer = one query's candidate set; state untouched. */
  private def topk(k: Int)(
      qid: Long, rows: Iterator[(Long, Long, Double)],
      state: GroupState[Long]): Iterator[Scored] = {
    val best = rows.map { case (_, nid, cos) => nid -> cos }.toMap
    best.toSeq.sortBy { case (nid, cos) => (-cos, nid) }
      .take(k).zipWithIndex
      .map { case ((nid, cos), i) => Scored(qid, nid, i + 1, cos) }
      .iterator
  }
}
