package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Monotonic vid assignment (SURVEY.md §2 #6).
  *
  * The reference's `inject-csv` assigns a sequentially increasing `vid`
  * to every row in block order while COPYing into postgres (reference
  * cmd/substreams-sink-graph-load/inject_csv.go) — inherently serial.
  *
  * Spark-first scale path (SURVEY.md §6): a global
  * `row_number() OVER (ORDER BY block_num)` would single-partition the
  * sort. Instead:
  *
  *   1. count rows per bundle (`block_num div bundleSize`) — map-side
  *      combined hash-agg, |bundles| output rows;
  *   2. prefix-sum the counts on the driver (tiny: height/bundleSize
  *      entries, e.g. 20k for 20M blocks @ 1k) → per-bundle vid offset;
  *   3. `row_number()` WITHIN each bundle partition + broadcast-joined
  *      offset.
  *
  * Because the bundle key is a monotone function of `block_num`, the
  * result is identical to the global row_number, but every partition
  * sorts independently — the plan has no global sort and no single-
  * partition exchange.
  */
object VidAssigner {

  def assignVids(spark: SparkSession, changes: DataFrame, bundleSize: Long): DataFrame = {
    import spark.implicits._
    val rows = changes
      .filter(col("op") =!= "DELETE")
      .withColumn("bundle", expr(s"block_num div $bundleSize"))

    // (1)+(2): per-bundle counts -> driver prefix sum. The collect is
    // |bundles| rows — bounded by block height, not data volume.
    // (Round 12 tried folding the prefix sum into the plan as an
    // unpartitioned window over the counts aggregate — one job instead
    // of two, no driver barrier — but it was wall-neutral at sf0.1 AND
    // PlanSpec's zero-single-partition-stage gate for this key rightly
    // refuses the SinglePartition exchange the window needs; the
    // driver fold stays.)
    val counts = rows.groupBy(col("bundle")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // offset of bundle b = sum of counts of all bundles < b
    val offsetRows = {
      var acc = 0L
      counts.map { case (b, n) => val o = acc; acc += n; (b, o) }
    }.toSeq.toDF("bundle", "vid_offset")

    // (3): rank within bundle, add the broadcast offset.
    val wInBundle = Window.partitionBy("bundle").orderBy("block_num", "id")
    rows
      .join(broadcast(offsetRows), "bundle")
      .withColumn("vid", row_number().over(wInBundle) + col("vid_offset"))
      .select(col("vid"), col("id"), col("block_num"))
  }
}
