package graft

import graft.queries.Analytics
import org.apache.spark.sql.functions._

/** Pins all three retention implementations to each other: the
  * SERVING distinct-agg form (round 12), the retired sorted fold
  * (rounds 10-11), and the generic window+distinct form — same grid,
  * bit for bit, on the real layout AND on constructed multi-week
  * shapes written through the same bucketed-sorted writer the layout
  * uses. The fold's contract — per-partition user contiguity +
  * in-user ts order — is exactly what `Bucketing.writeBucketedSorted`
  * produces, so the spec exercises the contract through the real
  * mechanism, not a hand-sorted Seq; keeping the fold green keeps it
  * honest as the recorded alternative. */
class RetentionFoldSpec extends SparkSpec {

  private def grid(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("serving agg == fold == window+distinct on the standing sf0.001 layout") {
    val ev = Analytics.sortedScanSession(spark)
      .table(Analytics.bucketedEvents(spark, sf))
    val serving = grid(Analytics.retentionDistinctAgg(ev))
    assert(serving === grid(Analytics.retention(ev)))
    assert(serving === grid(Analytics.retentionSortedFold(ev)))
    // sanity: the grid is non-trivial (multiple cohorts or offsets)
    assert(serving.size > 1)
  }

  test("all three == on a constructed multi-user multi-week table") {
    val s = spark
    import s.implicits._
    // users with: single week, gap weeks, repeated events in one week,
    // activity starting at different cohorts — shuffled input order,
    // restored by the bucketed-sorted write
    val wk = Analytics.WeekUs
    val rows = Seq(
      (1L, 0L), (1L, 1L), (1L, wk), (1L, 3 * wk), (1L, 3 * wk + 5),
      (2L, wk), (2L, wk + 1),
      (3L, 2 * wk), (3L, 4 * wk), (3L, 9 * wk),
      (4L, 0L), (4L, 0L), (4L, 10 * wk)
    )
    val df = scala.util.Random.shuffle(rows).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        monotonically_increasing_id().as("event_id"))
    graft.operators.Bucketing.writeBucketedSorted(
      df, "retention_fold_spec", "user_id", Seq("user_id", "ts", "event_id"), 3)
    val ev = Analytics.sortedScanSession(spark).table("retention_fold_spec")
    try {
      assert(grid(Analytics.retentionDistinctAgg(ev)) === grid(Analytics.retention(ev)))
      assert(grid(Analytics.retentionSortedFold(ev)) === grid(Analytics.retention(ev)))
      // the hand-derivable truth: user1 cohort 0 offsets {0,1,3},
      // user2 cohort 1 offset {0}, user3 cohort 2 offsets {0,2,7},
      // user4 cohort 0 offsets {0,10}
      assert(grid(Analytics.retentionDistinctAgg(ev)) === Set(
        (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L), (0L, 10L, 1L),
        (1L, 0L, 1L), (2L, 0L, 1L), (2L, 2L, 1L), (2L, 7L, 1L)))
    } finally spark.sql("DROP TABLE IF EXISTS retention_fold_spec")
  }
}
