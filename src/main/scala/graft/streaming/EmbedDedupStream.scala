package graft.streaming

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming embedding near-dup gate (SURVEY.md §2 #42c): admit only
  * incoming vectors that are NOT near-duplicates (cosine ≥ tau) of the
  * static reference corpus — the "is this already in my training set"
  * filter an ingest pipeline runs continuously against the corpus it
  * has shipped so far.
  *
  * Spark-first: a stream-static LEFT ANTI join, natively supported in
  * append mode with NO state store at all — the reference side is a
  * plain (re-broadcastable) batch DataFrame, and each micro-batch
  * probes it statelessly. Blocking by the deterministic sign-LSH
  * bucket ([[Vectors.signBucketsInt]], the same 8-plane blocking the
  * batch `dd_embed_cosine` uses) keeps the join an equi-join on the
  * bucket key: candidates are only compared within a bucket, and the
  * cosine cut rides along as a residual join predicate. Same
  * recall/blocking tradeoff as the batch operator — a near-dup landing
  * in a different bucket is missed — which is the documented,
  * spec-pinned semantics of the family, not a streaming regression.
  *
  * Scale: the reference index is the (vec_id, qv, n2, bucket)
  * projection — ~0.5 KB/vector; at billions of reference vectors the
  * same query runs with the static side as a bucketed table (the join
  * stays an equi-join on `bucket`, so storage-partitioned reads keep
  * it shuffle-free on the static side), and the stream side only ever
  * shuffles its own micro-batch.
  */
object EmbedDedupStream {

  /** Reference-side projection: quantize once, bucket once. */
  def referenceIndex(reference: DataFrame): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(reference.sparkSession)
    reference
      .select(col("vec_id"), Vectors.quantize(col("embedding")).as("qv"))
      .withColumn("n2", Vectors.dot(col("qv"), col("qv")))
      .filter(col("n2") > 0)
      .select(col("vec_id").as("ref_id"), col("qv").as("ref_qv"),
        col("n2").as("ref_n2"),
        element_at(Vectors.signBucketsInt(col("qv"),
          graft.queries.Dedup.NumPlanes, graft.queries.Dedup.Dims), 1)
          .as("bucket"))
  }

  /** `stream` needs (vec_id, embedding); emits the novel vectors'
    * (vec_id, embedding) append-only. `refIndex` is
    * [[referenceIndex]]'s output (built once, reused every batch).
    * Zero-norm vectors (cosine undefined) are admitted — nothing can
    * be their near-dup. */
  def novelVectors(stream: DataFrame, refIndex: DataFrame, tau: Double): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(stream.sparkSession)
    val probed = stream
      .select(col("vec_id"), col("embedding"),
        Vectors.quantize(col("embedding")).as("qv"))
      .withColumn("n2", Vectors.dot(col("qv"), col("qv")))
      .withColumn("bucket",
        element_at(Vectors.signBucketsInt(col("qv"),
          graft.queries.Dedup.NumPlanes, graft.queries.Dedup.Dims), 1))
    probed.join(refIndex,
        probed("bucket") === refIndex("bucket") &&
          Vectors.cosine(Vectors.dot(col("qv"), col("ref_qv")),
            col("n2"), col("ref_n2")) >= tau,
        "left_anti")
      .select(col("vec_id"), col("embedding"))
  }
}
