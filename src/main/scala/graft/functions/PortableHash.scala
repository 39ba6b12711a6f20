package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hash primitives (SURVEY.md §4).
  *
  * Dedup / MinHash need a hash function that DuckDB can reproduce
  * exactly for the oracle compare. md5 is standard in both engines; the
  * first 15 hex chars are a 60-bit value. Two forms:
  *
  *   - [[long60]] — 60-bit numeric form; Spark `conv(...,16,10)` and
  *     DuckDB `'0x…'::BIGINT` agree exactly (60 bits < int64).
  *
  * All codegen'd built-ins — no UDFs.
  */
object PortableHash {

  def long60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[long60]] (`'0x…'::BIGINT` hex cast). */
  def long60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  // ---- universal-hash permutation family -----------------------------
  //
  // MinHash needs K permutations per shingle. K md5 calls per shingle
  // row dominate the whole operator at scale; instead hash ONCE
  // ([[long60]]) and derive the K permutations with a universal hash
  // (a_i·h + b_i) mod P — exact int64 arithmetic, identical in DuckDB
  // ((P-1)² < 2^63, no overflow).

  /** Mersenne prime 2^31-1. */
  val P: Long = 2147483647L

  /** Deterministic (a, b) coefficients for permutation i, derived from
    * md5 so both engines inline the same literals. */
  def permCoef(i: Int): (Long, Long) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"perm$i".getBytes("UTF-8"))
    val a = (java.nio.ByteBuffer.wrap(d, 0, 8).getLong & Long.MaxValue) % (P - 1) + 1
    val b = (java.nio.ByteBuffer.wrap(d, 8, 8).getLong & Long.MaxValue) % P
    (a, b)
  }

  /** Permutation i applied to a 60-bit hash column. */
  def perm(i: Int, h: Column): Column = {
    val (a, b) = permCoef(i)
    (h % P * a + b) % P
  }

  /** DuckDB twin of [[perm]]. */
  def permSql(i: Int, h: String): String = {
    val (a, b) = permCoef(i)
    s"(($h % $P) * $a + $b) % $P"
  }
}
