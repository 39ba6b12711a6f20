package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{SinkMetrics, SinkProgressListener}

/** gl_sink_metrics (reference sinker/stats.go + metrics.go): the
  * operational telemetry fold, pinned against a replayed stream of
  * known composition. */
class SinkMetricsSpec extends SparkSpec {

  test("sink metrics: counters fold a replayed stream's known composition exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._

    // deterministic clock: +1s per recorded batch
    val fake = new AtomicLong(1000000L)
    val metrics = new SinkMetrics(clock = () => fake.addAndGet(1000L))
    val listener = new SinkProgressListener
    spark.streams.addListener(listener)

    // (entity, id, block_num, op, value, tsMs): Event on blocks 0-9
    // (3 rows each), Transfer on blocks 5-14 (2 rows each), plus two
    // UNDO signals at already-seen blocks
    def eventRows(bs: Range) = bs.flatMap(b => (0 until 3).map(i =>
      ("Event", s"e$b-$i", b.toLong, "CREATE", 1.0, 1700000000000L + b * 1000L)))
    def transferRows(bs: Range) = bs.flatMap(b => (0 until 2).map(i =>
      ("Transfer", s"t$b-$i", b.toLong, "UPDATE", 2.0, 1700000000000L + b * 1000L)))
    val undoRows = Seq(
      ("Event", "u1", 12L, "UNDO", 0.0, 1700000000000L + 12000L),
      ("Transfer", "u2", 13L, "UNDO", 0.0, 1700000000000L + 13000L))
    // waves deliver whole blocks (the BlockScopedData contract)
    val waves = Seq(
      eventRows(0 until 5),
      eventRows(5 until 10) ++ transferRows(5 until 10),
      transferRows(10 until 15) ++ undoRows)

    val input = MemoryStream[(String, String, Long, String, Double, Long)]
    val q = input.toDF()
      .toDF("entity", "id", "block_num", "op", "value", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
      .writeStream.queryName("sink_metrics_q")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        metrics.record(b)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_metrics_ckpt").toString)
      .start()
    try {
      waves.foreach { w => input.addData(w); q.processAllAvailable() }
    } finally q.stop()

    val snap = metrics.snapshot(spark).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(snap.keySet === Set("Event", "Transfer"))
    val ev = snap("Event"); val tr = snap("Transfer")
    // per-type flushed-entity counts (UNDO rows are signals, not flushes)
    assert(ev.getLong(1) === 30L)
    assert(tr.getLong(1) === 20L)
    // head block + head timestamp: the monotonic maxima (stats.go RecordBlock)
    assert(ev.getLong(3) === 14L)
    assert(ev.getTimestamp(4).getTime === 1700000000000L + 14000L)
    // block count: waves deliver whole blocks, so distinct sums exactly
    assert(ev.getLong(5) === 15L)
    // undo signals counted apart from entity flushes
    assert(ev.getLong(7) === 2L)
    // headline columns identical on every row (denormalized snapshot)
    assert(ev.toSeq.drop(3) === tr.toSeq.drop(3))

    // rates: with the +1s-per-batch clock, elapsed == (n_batches-1)*1000
    val nBatches = ev.getLong(8)
    val elapsed = ev.getLong(9)
    assert(nBatches >= 3L)
    assert(elapsed === (nBatches - 1L) * 1000L)
    assert(ev.getDouble(2) === 30L * 1000.0 / elapsed)
    assert(ev.getDouble(6) === 15L * 1000.0 / elapsed)

    // StreamingQueryProgress arm: the engine's own row count converges
    // on the fed total (events deliver async — poll with a deadline)
    val want = waves.map(_.size).sum.toLong
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (listener.totalRows("sink_metrics_q") < want &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(listener.totalRows("sink_metrics_q") === want)
    assert(listener.totalBatches("sink_metrics_q") >= 3L)
    spark.streams.removeListener(listener)
  }

  test("sink metrics: empty and ts-less batches are safe; empty snapshot is a placeholder row") {
    import spark.implicits._
    val m = new SinkMetrics(clock = () => 42L)
    val empty = m.snapshot(spark).collect()
    assert(empty.length === 1 && empty(0).getString(0) === "")
    assert(empty(0).getLong(9) === 0L) // elapsed 0: nothing recorded

    // ts-less frame folds with a null head timestamp
    m.record(Seq(("Event", 7L, "CREATE")).toDF("entity", "block_num", "op"))
    m.record(spark.emptyDataFrame
      .select(lit("x").as("entity"), lit(0L).as("block_num"), lit("CREATE").as("op"))
      .filter(lit(false)))
    val snap = m.snapshot(spark).collect()
    assert(snap.length === 1)
    assert(snap(0).getString(0) === "Event" && snap(0).getLong(1) === 1L)
    assert(snap(0).getLong(3) === 7L)
    assert(snap(0).isNullAt(4))
    assert(snap(0).getLong(8) === 2L) // both record calls counted
  }

  test("prometheus exposition: exact text for a replayed composition") {
    import spark.implicits._
    val m = new SinkMetrics(clock = () => 42L)
    // two deterministic "micro-batches" delivering whole blocks (the
    // BlockScopedData contract): blocks 1-2 then block 3, with one
    // UNDO signal riding block 3
    m.record(Seq(
      ("Event", 1L, "CREATE", 1700000001000L),
      ("Event", 1L, "UPDATE", 1700000001000L),
      ("Event", 2L, "CREATE", 1700000002000L)).toDF("entity", "block_num", "op", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms"))
    m.record(Seq(
      ("Event", 3L, "UPDATE", 1700000003000L),
      ("Transfer", 3L, "CREATE", 1700000003000L),
      ("Transfer", 3L, "UNDO", 1700000003000L)).toDF("entity", "block_num", "op", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms"))
    // the designed counter's name+help verbatim from sinker/metrics.go,
    // entity split as a LABELED-ONLY family (CounterVec shape — an
    // unlabeled total in the same family would make sum() over the
    // family double-count); last_block keeps stats.go's logged field
    // name. Text format per the public Prometheus exposition spec
    // (# HELP / # TYPE / series).
    assert(m.prometheus ===
      """# HELP substreams_sink_graphcsv_flushed_e The number of flushed entries
        |# TYPE substreams_sink_graphcsv_flushed_e counter
        |substreams_sink_graphcsv_flushed_e{entity="Event"} 4
        |substreams_sink_graphcsv_flushed_e{entity="Transfer"} 1
        |# HELP substreams_sink_graphcsv_last_block Last block number handled by the sink
        |# TYPE substreams_sink_graphcsv_last_block gauge
        |substreams_sink_graphcsv_last_block 3
        |# HELP substreams_sink_graphcsv_head_block_timestamp_ms Timestamp of the head block, unix milliseconds
        |# TYPE substreams_sink_graphcsv_head_block_timestamp_ms gauge
        |substreams_sink_graphcsv_head_block_timestamp_ms 1700000003000
        |# HELP substreams_sink_graphcsv_undo_signals Undo signals handled
        |# TYPE substreams_sink_graphcsv_undo_signals counter
        |substreams_sink_graphcsv_undo_signals 1
        |# HELP substreams_sink_graphcsv_blocks Blocks handled
        |# TYPE substreams_sink_graphcsv_blocks counter
        |substreams_sink_graphcsv_blocks 3
        |# HELP substreams_sink_graphcsv_batches Micro-batches folded into the counters
        |# TYPE substreams_sink_graphcsv_batches counter
        |substreams_sink_graphcsv_batches 2
        |""".stripMargin)
    // label values escape the exposition metacharacters
    val weird = new SinkMetrics(clock = () => 1L)
    weird.record(Seq(("""Na"me\n""", 1L, "CREATE"))
      .toDF("entity", "block_num", "op"))
    assert(weird.prometheus.contains(
      """substreams_sink_graphcsv_flushed_e{entity="Na\"me\\n"} 1"""))
  }
}
