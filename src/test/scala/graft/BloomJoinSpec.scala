package graft

import graft.queries.Analytics
import org.apache.spark.sql.execution.ExplainMode

/** q_bloom_join (#26k) — the runtime-filter join must (a) actually get
  * the Bloom probe injected into the fact side, (b) run as a shuffle
  * join (the 100 TB shape it demonstrates — no broadcast), and (c) be
  * semantically invisible: identical rows with the rule off.
  */
class BloomJoinSpec extends SparkSpec {

  private def plan(dir: String): String = {
    val df = Analytics.qBloomJoin(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("simple"))
  }

  test("bloom probe is injected map-side on the fact scan") {
    val p = plan(sf)
    // the creation side aggregates the dim keys into the filter...
    assert(p.contains("bloom_filter_agg"), p)
    // ...and the probe filters the fact branch BELOW the join (the
    // plan prints children after their parent join node)
    assert(p.contains("might_contain"), p)
    assert(p.indexOf("might_contain") > p.indexOf("Join"), p)
  }

  test("the dim is NOT broadcast: big-dim shape is a shuffle join") {
    val p = plan(sf)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
  }

  test("bloom filtering is semantically invisible (false positives re-filtered)") {
    import org.apache.spark.sql.functions._
    val withBloom = Analytics.qBloomJoin(spark, sf)
      .orderBy("p_brand", "p_size").collect().toSeq
    // plain session, rule at defaults (thresholds keep it off at this SF)
    val dim = Tables.part(spark, sf).filter(col("p_size") <= 2)
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") / 100.0)
          .as("revenue"))
      .orderBy("p_brand", "p_size").collect().toSeq
    assert(withBloom === plain)
    assert(withBloom.nonEmpty)
  }
}
