package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Builds a `copies`-way self-union of a testdata sf dir with
  * FK-CONSISTENT key remaps across ALL tables, so the whole oracle
  * suite — not just the dedup/ANN families the Soak corpus covers —
  * can be verified at ~sf1 (`copies`=10 over sf0.1 ≈ 6M lineitem
  * rows).
  *
  * Remap design (copy i, offset `i · 10^8`, far above any real key):
  *   - region/nation stay single-copy: they are FK-referenced enums,
  *     and keeping them fixed keeps every `*_nationkey` valid without
  *     a cascading remap;
  *   - every other table's PRIMARY key and the FKs that reference a
  *     remapped table shift together (`o_custkey`→customer,
  *     `l_orderkey`→orders, `l_partkey`/`l_suppkey`→part/supplier), so
  *     join cardinalities scale exactly linearly;
  *   - events: `event_id` (the entity-change block number) shifts, so
  *     per-user SCD2 histories get `copies`× DEEPER with strictly
  *     increasing distinct blocks — no window-order ties, fully
  *     deterministic across engines; `ts` shifts by 400 days per copy
  *     (sessions stay era-separated instead of colliding on identical
  *     timestamps); `user_id` is KEPT (state-per-key is the
  *     adversarial axis);
  *   - documents/embeddings: ids shift, payloads identical — every doc
  *     gains `copies−1` exact twins, the worst case for the dedup
  *     family by construction.
  *
  * Usage: `sbt "runMain graft.ScaleUp <src> <dst> <copies>"`.
  */
object ScaleUp {

  /** Per-copy key-band width. MUST exceed the SOURCE's key span or
    * copies collide and every key-equality join silently degenerates
    * into a many-to-many explosion (round 12: scaling sf10 — itself
    * 1e8-banded from sf0.1 — by another 1e8 made orders⋈customer a
    * 9.7×-fanout join and ordnat 1.45B rows). Override with
    * SPARK_GRAFT_SCALEUP_OFF when the source is already banded
    * (sf10 → sf100 wants 1e10); the guard below refuses to write
    * colliding copies either way. */
  val Off: Long = sys.env.get("SPARK_GRAFT_SCALEUP_OFF").map(_.toLong)
    .getOrElse(100000000L)
  /** 400 days in microseconds — one "era" per copy for ts columns. */
  val TsShiftMicros: Long = 400L * 24 * 3600 * 1000000L

  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shiftKeys(df: DataFrame, i: Int, keys: String*): DataFrame = {
      // collision guard: a source key reaching the next band would
      // alias another copy's keys — refuse loudly instead of writing
      // a degenerate corpus (checked once, on the i=0 pass)
      if (i == 0) keys.foreach { k =>
        val mx = df.agg(max(col(k)).cast("long")).head.getLong(0)
        require(mx < Off,
          s"$k max $mx >= band width $Off — copies would collide; " +
            "set SPARK_GRAFT_SCALEUP_OFF above the source key span")
      }
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Off)))
    }

    def union(name: String, remap: (DataFrame, Int) => DataFrame,
              base: DataFrame): Unit =
      (0 until copies).map(i => remap(base, i))
        .reduce(_ unionAll _)
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // single-copy dimension enums
    Seq("region", "nation").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode("overwrite").parquet(s"$dst/$n.parquet")
    }
    union("customer", shiftKeys(_, _, "c_custkey"),
      spark.read.parquet(s"$src/customer.parquet"))
    union("supplier", shiftKeys(_, _, "s_suppkey"),
      spark.read.parquet(s"$src/supplier.parquet"))
    union("part", shiftKeys(_, _, "p_partkey"),
      spark.read.parquet(s"$src/part.parquet"))
    union("orders", shiftKeys(_, _, "o_orderkey", "o_custkey"),
      spark.read.parquet(s"$src/orders.parquet"))
    union("lineitem", shiftKeys(_, _, "l_orderkey", "l_partkey", "l_suppkey"),
      spark.read.parquet(s"$src/lineitem.parquet"))
    union("documents", shiftKeys(_, _, "doc_id"),
      spark.read.parquet(s"$src/documents.parquet"))
    union("embeddings", shiftKeys(_, _, "vec_id"),
      spark.read.parquet(s"$src/embeddings.parquet"))
    // events: via Tables.events so ts is already a microsecond
    // TIMESTAMP (the nanos source is unreadable as a timestamp);
    // user_id KEPT, event_id (= block number) and ts era-shifted
    union("events",
      (df, i) => shiftKeys(df, i, "event_id")
        .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 400} DAYS")),
      Tables.events(spark, src))

    val counts = Seq("lineitem", "events", "documents", "embeddings")
      .map(t => s""""$t":${spark.read.parquet(s"$dst/$t.parquet").count()}""")
      .mkString(",")
    println(s"""{"scaleup":{"src":"$src","dst":"$dst","copies":$copies,$counts}}""")
    spark.stop()
  }
}
