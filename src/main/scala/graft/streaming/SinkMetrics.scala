package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types._

/** Operational sink telemetry (reference sinker/stats.go:14-60 — the
  * `RecordBlock`/`RecordLastBlockHash` recorders and the ticker that
  * logs them; sinker/metrics.go + csvprocessor/metrics.go — the
  * designed flushed-entities counter; sinker/sinker.go:270-271 records
  * the cursor's block per handled BlockScopedData). The reference
  * keeps these as mutable fields a goroutine prints; the Spark
  * re-expression folds the SAME counters from each micro-batch in
  * `foreachBatch` (the handleBlockScopedData seam every sink
  * composition already rides) and snapshots them as a DataFrame — the
  * stats artifact a dashboard or the driver's progress log reads.
  *
  * Scale: `record` runs one bounded aggregation per micro-batch whose
  * result is |entity types| × |ops| rows plus one global row — never
  * row-proportional driver state. The counters themselves are a
  * driver-side TrieMap bounded by the schema's type count, exactly as
  * bounded as the reference's own stats struct.
  *
  * Block accounting contract: a block's payload arrives WHOLE in one
  * micro-batch (the sinker's BlockScopedData unit — sinker.go:213
  * unmarshals per block), so per-batch distinct block counts sum to
  * the stream's block count; head block/timestamp are monotonic
  * maxima and hold under any batching. */
final class SinkMetrics(clock: () => Long = () => System.currentTimeMillis()) {

  private val startMs = new AtomicLong(Long.MinValue)
  private val lastMs = new AtomicLong(Long.MinValue)
  private val headBlock = new AtomicLong(Long.MinValue)
  private val headBlockTsUs = new AtomicLong(Long.MinValue)
  private val nUndo = new AtomicLong(0L)
  private val nBlocks = new AtomicLong(0L)
  private val nBatches = new AtomicLong(0L)
  private val perEntity = TrieMap.empty[String, Long]

  /** Fold one micro-batch of decoded changes into the counters —
    * needs (entity, block_num, op); `ts` optional (head timestamp).
    * UNDO rows count as undo signals, not entity flushes (the
    * reference's handleBlockUndoSignal arm, sinker.go:291). */
  def record(batch: DataFrame): Unit = {
    val now = clock()
    startMs.compareAndSet(Long.MinValue, now)
    // two bounded aggregations read the batch — persist so the source
    // micro-batch is scanned ONCE (an unpersisted foreachBatch frame
    // re-reads the source per action, double-counting numInputRows in
    // the engine's own progress and paying the scan twice)
    batch.persist()
    try recordPersisted(batch, now) finally { batch.unpersist(): Unit }
  }

  private def recordPersisted(batch: DataFrame, now: Long): Unit = {
    val hasTs = batch.columns.contains("ts")
    val tsMax = if (hasTs) max(unix_micros(col("ts"))) else lit(null).cast("long")
    val global = batch.agg(
      count_distinct(col("block_num")).as("nb"),
      max(col("block_num")).as("hb"),
      tsMax.as("hts"),
      sum(when(col("op") === "UNDO", 1L).otherwise(0L)).as("nu")).head()
    if (!global.isNullAt(1)) {
      nBlocks.addAndGet(global.getLong(0))
      headBlock.updateAndGet(math.max(_, global.getLong(1)))
      if (!global.isNullAt(2))
        headBlockTsUs.updateAndGet(math.max(_, global.getLong(2)))
      nUndo.addAndGet(global.getLong(3))
    }
    batch.filter(col("op") =!= "UNDO")
      .groupBy(col("entity")).agg(count(lit(1)).as("n"))
      .collect().foreach { r =>
        val (e, n) = (r.getString(0), r.getLong(1))
        perEntity.updateWith(e)(prev => Some(prev.getOrElse(0L) + n)): Unit
      }
    nBatches.incrementAndGet(): Unit
    lastMs.updateAndGet(math.max(_, now)): Unit
  }

  private val frameSchema = StructType(Seq(
    StructField("entity", StringType),
    StructField("n_changes", LongType),
    StructField("changes_per_sec", DoubleType),
    StructField("head_block", LongType),
    StructField("head_block_ts", TimestampType),
    StructField("n_blocks", LongType),
    StructField("blocks_per_sec", DoubleType),
    StructField("n_undo", LongType),
    StructField("n_batches", LongType),
    StructField("elapsed_ms", LongType)))

  /** Snapshot the counters as the stats frame: one row per entity type
    * (headline columns — head block/ts, block counts and rates, undo
    * and batch counts — repeated on each row, the denormalized shape a
    * metrics scraper reads without a join). Rates are counts over the
    * recorded wall window, the `LogNow` ticker's derivative. */
  def snapshot(spark: SparkSession): DataFrame = {
    val elapsed = math.max(lastMs.get() - startMs.get(), 1L)
    def rate(n: Long): Double = n * 1000.0 / elapsed
    val hb = headBlock.get()
    val hbRow: java.lang.Long = if (hb == Long.MinValue) null else hb
    val hts = headBlockTsUs.get()
    val htsRow: java.sql.Timestamp =
      if (hts == Long.MinValue) null
      else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        hts / 1000000L, (hts % 1000000L) * 1000L))
    val entities = if (perEntity.isEmpty) Seq("" -> 0L)
      else perEntity.toSeq.sortBy(_._1)
    val rows = entities.map { case (e, n) =>
      Row(e, n, rate(n), hbRow, htsRow, nBlocks.get(), rate(nBlocks.get()),
        nUndo.get(), nBatches.get(),
        if (startMs.get() == Long.MinValue) 0L else elapsed)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), frameSchema)
  }

  /** The counters in Prometheus text exposition format (the public
    * format dmetrics registers its set under — reference
    * sinker/metrics.go:11 designs exactly one sink counter,
    * `substreams_sink_graphcsv_flushed_e` "The number of flushed
    * entries"; that name and help text are rendered verbatim, with the
    * per-entity split as a labeled family — LABELED ONLY, the way a Go
    * client_golang CounterVec exposes it: mixing an unlabeled total
    * into the same family is legal text but makes
    * `sum(substreams_sink_graphcsv_flushed_e)` double-count, so the
    * total is the consumer's `sum()` at query time. This deviates from
    * the reference's single UNLABELED counter in shape, not in sum —
    * the reference has no per-entity split to collide with). The rest
    * of the stats frame exports as
    * gauges in the same `substreams_sink_graphcsv_*` namespace —
    * `last_block` keeps stats.go:69's logged field name. Rendered the
    * way [[graft.operators.CopyInjector]] renders psql scripts: a text
    * artifact from driver-side bounded state, no jobs run. */
  def prometheus: String = {
    def esc(v: String): String = v
      .replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
    val out = new StringBuilder
    def family(name: String, help: String, typ: String)
              (series: (String, String)*): Unit = {
      out ++= s"# HELP $name $help\n# TYPE $name $typ\n"
      series.foreach { case (labels, v) => out ++= s"$name$labels $v\n" }
    }
    val flushed = perEntity.toSeq.sortBy(_._1)
    family("substreams_sink_graphcsv_flushed_e",
      "The number of flushed entries", "counter")(
      flushed.map { case (e, n) => (s"""{entity="${esc(e)}"}""", n.toString) }: _*)
    family("substreams_sink_graphcsv_last_block",
      "Last block number handled by the sink", "gauge")(
      "" -> (if (headBlock.get() == Long.MinValue) "0" else headBlock.get().toString))
    if (headBlockTsUs.get() != Long.MinValue)
      family("substreams_sink_graphcsv_head_block_timestamp_ms",
        "Timestamp of the head block, unix milliseconds", "gauge")(
        "" -> (headBlockTsUs.get() / 1000L).toString)
    family("substreams_sink_graphcsv_undo_signals",
      "Undo signals handled", "counter")("" -> nUndo.get().toString)
    family("substreams_sink_graphcsv_blocks",
      "Blocks handled", "counter")("" -> nBlocks.get().toString)
    family("substreams_sink_graphcsv_batches",
      "Micro-batches folded into the counters", "counter")(
      "" -> nBatches.get().toString)
    out.result()
  }
}

/** The `StreamingQueryProgress` arm of the telemetry: the engine's own
  * per-micro-batch row counts and timestamps, accumulated per query
  * name — the reference's periodic stats goroutine reads its process'
  * counters the same way, OUTSIDE the data path. Events arrive async;
  * readers poll [[totalRows]] against an expectation rather than
  * assuming delivery. */
final class SinkProgressListener extends StreamingQueryListener {
  private val rows = TrieMap.empty[String, Long]
  private val batches = TrieMap.empty[String, Long]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
    rows.updateWith(name)(p => Some(p.getOrElse(0L) + e.progress.numInputRows)): Unit
    batches.updateWith(name)(p => Some(p.getOrElse(0L) + 1L)): Unit
  }

  /** Engine-counted input rows for a query so far. */
  def totalRows(name: String): Long = rows.getOrElse(name, 0L)
  /** Progress events (≈ non-empty micro-batches) seen for a query. */
  def totalBatches(name: String): Long = batches.getOrElse(name, 0L)
}
