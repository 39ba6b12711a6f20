package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (SURVEY.md §2 #31-33).
  *
  * Cross-engine float summation order is not portable (oracle parity,
  * SURVEY.md §4), so similarity math runs on QUANTIZED vectors:
  * `floor(x * 1e6)` per element is exact int64 in both engines
  * (float→double is exact, the multiply and floor are IEEE-identical),
  * dot products stay integer (64 dims × 1e12 < 2^63), and the final
  * cosine is one correctly-rounded double division — bit-identical in
  * Spark and DuckDB.
  *
  * All higher-order built-ins (`transform`/`zip_with`/`aggregate`) —
  * codegen-friendly, no UDFs, fully distributed.
  */
object Vectors {

  /** float array → exact int64 array (×1e6). */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * 1000000d).cast("long"))

  /** integer dot product of two quantized vectors — the native
    * codegen'd [[LongDot]] expression (resolved through the function
    * registry; query entry points call
    * [[graft.plans.GraftExtensions.ensureRegistered]]). Exact int64,
    * deterministic. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_long_dot", a, b)

  /** cosine from integer dot + integer squared norms: one double
    * division and sqrt over exactly-representable inputs. */
  def cosine(dotAb: Column, na2: Column, nb2: Column): Column =
    dotAb.cast("double") / sqrt(na2.cast("double") * nb2.cast("double"))

  /** DuckDB twins (same math, same order). */
  val quantizeSql: String => String =
    v => s"list_transform($v, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), i -> $a[i] * $b[i]))"
  def cosineSql(dot: String, na2: String, nb2: String): String =
    s"CAST($dot AS DOUBLE) / sqrt(CAST($na2 AS DOUBLE) * CAST($nb2 AS DOUBLE))"

  // ---- deterministic random-hyperplane LSH ---------------------------

  /** ±1 hyperplane component for plane `j`, dimension `d`, derived from
    * md5 — reproducible in SQL (`substr(md5(j||'_'||d),1,1) <= '7'`).
    * The matrix is tiny and constant; Spark embeds it as literals, the
    * oracle recomputes it inline. */
  def planeSign(j: Int, d: Int): Int = {
    val h = MessageDigest.getInstance("MD5")
      .digest(s"${j}_$d".getBytes(StandardCharsets.UTF_8))
    // first hex char = high nibble of byte 0; 0-7 -> +1, 8-f -> -1
    if (((h(0) >> 4) & 0xf) <= 7) 1 else -1
  }

  /** Flattened ±1 matrix (row-major, planes × dims) for planes
    * [offset, offset + nPlanes) — the literal input of
    * [[SignBuckets]]. */
  def planeMatrix(nPlanes: Int, dims: Int, offset: Int = 0): Seq[Long] =
    (0 until nPlanes).flatMap(j => (0 until dims).map(d => planeSign(offset + j, d).toLong))

  /** Integer sign-LSH bucket keys, one per 8-plane group, via the
    * single-pass [[SignBuckets]] expression (one tree node instead of
    * ~10 per plane — the composable form's analysis/codegen time
    * dominated the whole ANN query). */
  def signBucketsInt(qv: Column, nPlanes: Int, dims: Int): Column =
    call_function("graft_sign_buckets", qv, typedLit(planeMatrix(nPlanes, dims)))

  /** Multiprobe: every bucket within hamming distance `maxDist` of an
    * integer bucket key is just `bucket XOR mask` over the literal
    * low-popcount masks. */
  def hammingProbesInt(bucket: Column, nPlanes: Int, maxDist: Int): Column = {
    val masks = (0 until (1 << nPlanes)).filter(m => Integer.bitCount(m) <= maxDist)
    transform(typedLit(masks), m => bucket.bitwiseXOR(m))
  }

  /** DuckDB twin of one integer bucket key (planes [0, nPlanes)). */
  def signBucketIntSql(qv: String, nPlanes: Int, dims: Int): String = {
    val bits = (0 until nPlanes).map { j =>
      val dot = s"list_sum(list_transform(generate_series(1, $dims), d -> " +
        s"(CASE WHEN substr(md5('${j}_' || CAST(d - 1 AS VARCHAR)), 1, 1) <= '7' THEN 1 ELSE -1 END) * $qv[d]))"
      s"(CASE WHEN $dot >= 0 THEN ${1 << j} ELSE 0 END)"
    }
    "(" + bits.mkString(" + ") + ")"
  }
}
