package graft.queries

import graft.Tables
import graft.functions.{PortableHash, Shingles, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family (SURVEY.md §2 #27-31) over `documents` /
  * `embeddings`.
  *
  * Scale design (SURVEY.md §6): every near-dup variant is an
  * inverted-index / bucket join — candidate pairs are generated only
  * within a shared shingle / band / sign-bucket, never by cross join.
  * Skew control: shingles above a document-frequency cap are dropped
  * before the pair join (stopword shingles would otherwise create
  * quadratic buckets — the same guard MinHashLSH uses at scale).
  */
object Dedup {

  /** Max documents a shingle may appear in before it is dropped from
    * the inverted index. Near-dups are identified by their RARE shared
    * shingles; common phrases (df above the cap) only inflate the pair
    * space quadratically — at sf0.1 a cap of 20 cuts candidate pairs
    * ~10× with the true-dup pairs (df≈2 buckets) untouched. */
  val DfCap = 20L
  /** Jaccard threshold as exact ratio: inter * JacDen >= union * JacNum. */
  val JacNum = 1L
  val JacDen = 2L
  /** MinHash: 16 permutations, 4 bands of 4 rows. */
  val NumPerms = 16
  val BandRows = 4
  /** Embedding near-dup: 8-plane sign bucket + cosine >= 0.95. */
  val NumPlanes = 8
  val Dims = 64
  val CosTau = 0.95

  // ---- #27 exact dedup ----------------------------------------------

  /** Exact dedup: hash-groupBy on md5(text), keep the lowest doc_id.
    * One map-side-combined shuffle of |distinct texts| rows. */
  def ddExact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  val ddExactSql: String =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_dups
      |FROM documents GROUP BY 1""".stripMargin

  // ---- shared shingle index -----------------------------------------

  /** Capped shingle buckets: shingle → sorted doc list, buckets larger
    * than the df cap dropped. ONE shuffle (map-side-combined list agg)
    * replaces the classic index self-join. */
  private def shingleBuckets(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("w", Shingles.tokens(col("text")))
      .select(col("doc_id"), explode(Shingles.hashedFromTokens(col("w"))).as("h"))
      .groupBy(col("h")).agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) <= DfCap)
      .select(array_sort(col("ids")).as("ids"))

  // ---- #28 n-gram Jaccard -------------------------------------------

  /** Near-dup pairs by shingle-set Jaccard >= 1/2. Pairs are generated
    * per shingle bucket by an in-expression combination explode —
    * bounded by DfCap² per bucket, never a cross join and never a
    * second pass over the index. The threshold test is exact integer
    * arithmetic — no FP, oracle-portable. */
  def ddNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val buckets = shingleBuckets(s, d)
    // all (a<b) pairs inside one bucket, as a flat struct array
    val pairExpr = flatten(transform(
      sequence(lit(1), size(col("ids")) - 1),
      i => transform(
        sequence(i + 1, size(col("ids"))),
        j => struct(element_at(col("ids"), i).as("a"), element_at(col("ids"), j).as("b")))))
    val pairs = buckets
      .filter(size(col("ids")) >= 2)
      .select(explode(pairExpr).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = buckets.select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    pairs
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na")), "doc_a")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb")), "doc_b")
      .withColumn("union_n", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * JacDen >= col("union_n") * JacNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("union_n"))
  }

  /** Oracle twin — deliberately the CLASSIC index self-join
    * formulation, independent of the bucket-combination plan above:
    * agreement of two different algorithms is a stronger check. */
  val ddNgramJaccardSql: String =
    s"""WITH ${Shingles.hashedShinglesCteSql()},
       |hot AS (SELECT h FROM hsh GROUP BY h HAVING COUNT(*) > ${DfCap}),
       |idx AS (SELECT doc_id, h FROM hsh WHERE h NOT IN (SELECT h FROM hot)),
       |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM idx GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM idx a JOIN idx b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, sa.n_sh + sb.n_sh - inter AS union_n
       |FROM pairs
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE inter * $JacDen >= (sa.n_sh + sb.n_sh - inter) * $JacNum""".stripMargin

  // ---- #29 MinHash + LSH --------------------------------------------

  /** MinHash signatures banded 4×4; candidate pairs share a band
    * bucket. Each shingle is md5-hashed ONCE to 60 bits; the 16
    * permutations are universal hashes (a·h+b mod P,
    * [[PortableHash.perm]]) — exact int64, portable, and ~16× less
    * hashing than seeded-md5 per permutation. The only shuffles: one
    * agg to signatures (|docs| rows), one bucket join. */
  def ddMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .withColumn("w", Shingles.tokens(col("text")))
      .select(col("doc_id"), explode(Shingles.hashedFromTokens(col("w"))).as("h"))
    val minCols = (0 until NumPerms).map(i => min(PortableHash.perm(i, col("h"))).as(s"h$i"))
    val mh = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bands = mh.select(col("doc_id"), posexplode(array(
      (0 until NumPerms / BandRows).map(b =>
        concat_ws("|", (0 until BandRows).map(r => col(s"h${b * BandRows + r}")): _*)): _*
    )).as(Seq("band", "bkey")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  val ddMinhashLshSql: String = {
    val mins = (0 until NumPerms)
      .map(i => s"min(${PortableHash.permSql(i, "h")}) AS h$i").mkString(",\n    ")
    val bandRows = (0 until NumPerms / BandRows).map { b =>
      val cat = (0 until BandRows).map(r => s"CAST(h${b * BandRows + r} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $cat AS bkey FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${Shingles.hashedShinglesCteSql()},
       |mh AS (
       |  SELECT doc_id,
       |    $mins
       |  FROM hsh GROUP BY doc_id),
       |bands AS (
       |  $bandRows)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id""".stripMargin
  }

  // ---- #30 SimHash (rows-only) --------------------------------------

  /** 16-bit SimHash from the 60-bit shingle hashes: bit j is the sign
    * of sum(±1) of each shingle's bit j. Hamming-band key = top byte.
    * Driver check is rows-only (bit-majority has no clean SQL twin);
    * the spec asserts identical docs hash identically. */
  def ddSimhash(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .withColumn("w", Shingles.tokens(col("text")))
      .select(col("doc_id"), explode(Shingles.hashedFromTokens(col("w"))).as("h"))
    val bitCols = (0 until 16).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val bitSums = sh.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val simhash = (0 until 16).map(j =>
      when(col(s"b$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _)
    bitSums
      .withColumn("simhash", simhash)
      .withColumn("band", shiftright(col("simhash"), 8))
      .select(col("doc_id"), col("simhash"), col("band"))
  }

  // ---- #31 embedding cosine near-dup --------------------------------

  /** Near-dup by quantized cosine >= 0.95, blocked by the 8-plane
    * deterministic sign bucket ([[Vectors.signBucket]]): pairs are only
    * generated within a bucket (expected bucket size n/256), then
    * verified with the exact integer-dot cosine. */
  def ddEmbedCosine(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), Vectors.quantize(col("embedding")).as("qv"))
      .withColumn("n2", Vectors.dot(col("qv"), col("qv")))
      .filter(col("n2") > 0)
      .withColumn("bucket", element_at(Vectors.signBucketsInt(col("qv"), NumPlanes, Dims), 1))
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Vectors.cosine(
        Vectors.dot(col("a.qv"), col("b.qv")), col("a.n2"), col("b.n2")))
      .filter(col("cos") >= CosTau)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }

  val ddEmbedCosineSql: String = {
    val qv = Vectors.quantizeSql("embedding")
    s"""WITH q AS (
       |  SELECT vec_id, $qv AS qv FROM embeddings),
       |n AS (
       |  SELECT vec_id, qv, ${Vectors.dotSql("qv", "qv")} AS n2,
       |         ${Vectors.signBucketIntSql("qv", NumPlanes, Dims)} AS bucket
       |  FROM q)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       ${Vectors.cosineSql(Vectors.dotSql("a.qv", "b.qv"), "a.n2", "b.n2")} AS cos
       |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE a.n2 > 0 AND b.n2 > 0
       |  AND ${Vectors.cosineSql(Vectors.dotSql("a.qv", "b.qv"), "a.n2", "b.n2")} >= $CosTau""".stripMargin
  }

  // ---- registry ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> (ddExact _),
    "dd_ngram_jaccard" -> (ddNgramJaccard _),
    "dd_minhash_lsh" -> (ddMinhashLsh _),
    "dd_simhash" -> (ddSimhash _),
    "dd_embed_cosine" -> (ddEmbedCosine _)
  )

  /** dd_simhash is rows-only (SURVEY.md §2). */
  val oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_embed_cosine" -> ddEmbedCosineSql
  )
}
