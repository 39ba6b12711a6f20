package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hash primitives (SURVEY.md §4).
  *
  * Dedup / MinHash need a hash function that DuckDB can reproduce
  * exactly for the oracle compare. md5 is standard in both engines; the
  * first 15 hex chars are a 60-bit value. Two forms:
  *
  *   - [[hex15]] — the hex-string form. Lowercase hex sorts
  *     lexicographically in numeric order, so `min(hex15)` IS the
  *     numeric minhash — no hex→int conversion needed (DuckDB has no
  *     `conv`), and string min is identical in both engines.
  *   - [[long60]] — the numeric form for Spark-only operators
  *     (SimHash bit tests); 60 bits < int64 so `conv` is exact.
  *
  * All codegen'd built-ins — no UDFs.
  */
object PortableHash {

  def hex15(c: Column): Column = substring(md5(c), 1, 15)

  def long60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded family for MinHash permutations: h_i(x) = hex15(i || ':' || x). */
  def seededHex15(i: Int, c: Column): Column = hex15(concat(lit(s"$i:"), c))

  /** DuckDB twin of [[seededHex15]]. */
  def seededHex15Sql(i: Int, expr: String): String =
    s"substr(md5('$i:' || $expr), 1, 15)"
}
