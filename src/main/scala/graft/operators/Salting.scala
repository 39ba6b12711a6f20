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

  /** Salted replicated JOIN for a fact side whose join key has too few
    * (or too hot) values to spread over a cluster: every fact row gets
    * a deterministic salt in [0, salts) from `saltSource`, the dim side
    * is replicated once per salt value, and the join runs on
    * (key, salt) — so a key that would land on ONE reducer spreads over
    * `salts` of them. Dim cost is |dim|·salts rows, which is why this
    * targets small-but-not-broadcastable dims or low-cardinality keys.
    *
    * AQE's skew-join split covers the runtime-detected case for
    * sort-merge joins; salting is the writer-side guarantee for keys
    * KNOWN to be degenerate (a 5-value type column joining a routing
    * dim leaves ≥995 of a 1000-reducer cluster idle without it). The
    * salt is plan-only — it is dropped after the join and every fact
    * row still matches exactly its key's dim rows, so the result is
    * indistinguishable from the plain join (the q_skew_join oracle). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val repDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }
}
