package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed group keys (SURVEY.md §6).
  *
  * A hash-agg over a key where one value holds a large share of all
  * rows (a viral entity id, an empty-string bucket) bottlenecks on the
  * one reducer owning that key. Salting splits each key into
  * `salts` sub-groups on a deterministic secondary hash, aggregates
  * the sub-groups (spreading the hot key over `salts` reducers), and
  * combines the partials with a second, tiny aggregation.
  *
  * AQE's skew handling covers JOINS; aggregation skew still needs this
  * rewrite. Only algebraic aggregates (sum/count/min/max) can be split
  * this way — the helper exposes exactly those.
  */
object Salting {

  /** Sum/count `valueCol` by `key` with `salts`-way salting; the salt
    * is derived from `saltSource` (any high-cardinality column) so the
    * result is deterministic. */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column, salts: Int)(
      aggs: (Column, String)*): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val partialCols = aggs.zipWithIndex.map { case ((c, how), i) =>
      (how match {
        case "sum"   => sum(c)
        case "count" => count(c)
        case "min"   => min(c)
        case "max"   => max(c)
        case other   => throw new IllegalArgumentException(
          s"non-algebraic aggregate '$other' cannot be salted")
      }).as(s"__p$i")
    }
    val partial = salted.groupBy(key.as("__k"), col("__salt"))
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.zipWithIndex.map { case ((_, how), i) =>
      (how match {
        case "sum" | "count" => sum(col(s"__p$i")) // counts combine by summing
        case "min"           => min(col(s"__p$i"))
        case "max"           => max(col(s"__p$i"))
      }).as(s"agg_$i")
    }
    partial.groupBy(col("__k"))
      .agg(finalCols.head, finalCols.tail: _*)
  }
}
