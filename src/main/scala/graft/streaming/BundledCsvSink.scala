package graft.streaming

import graft.functions.GraphCsv
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Bundled graph-CSV streaming sink (SURVEY.md §2 #40).
  *
  * The reference rolls one CSV file per `[k·bundleSize,(k+1)·bundleSize)`
  * block range as the stream advances (reference
  * csvprocessor/writer.go:35-99 Roll, bundler/bundler.go:100-203).
  * Structured-Streaming re-expression: `writeStream.foreachBatch`
  * serializing each micro-batch with the graph-CSV column expressions
  * and appending `partitionBy(bundle)` — the directory layout IS the
  * bundle roll, files bounded by bundleSize, no coordinator.
  */
object BundledCsvSink {

  /** Serialize a change batch to graph-CSV lines with its bundle key.
    * Columns: bundle, line — where line is `id,block$,value` for the
    * immutable layout (writer.go:158-180). */
  def toCsvLines(batch: DataFrame, bundleSize: Long): DataFrame =
    batch
      .withColumn("bundle", expr(s"block_num div $bundleSize"))
      .withColumn("line", concat_ws(",",
        col("id"),
        col("block_num").cast("string"),
        GraphCsv.typedText(col("value").cast("decimal(20,2)"), "BigDecimal", nullable = false)))
      .select(col("bundle"), col("line"))

  /** Idempotent per-batch write. `foreachBatch` is at-least-once: on
    * recovery the last in-flight micro-batch replays with the SAME
    * batch id, so a commit marker per id turns replays into no-ops —
    * the write-then-mark protocol the reference's bundler uses for
    * object-store uploads. (The residual window is a crash BETWEEN the
    * data write and the marker; closing it entirely needs
    * stage-and-rename, which the marker layout leaves room for.)
    * Returns false when the batch was already committed. */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String,
                 bundleSize: Long): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(outDir, s"_committed/batch-$batchId")
    val fs = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      toCsvLines(batch, bundleSize)
        .repartition(col("bundle"))
        .write.mode("append").partitionBy("bundle").text(outDir)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      true
    }
  }

  /** Start the sink: each micro-batch appends its lines under the
    * bundle partition directories, exactly once per batch id. */
  def start(changes: DataFrame, outDir: String, checkpointDir: String,
            bundleSize: Long): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, outDir, bundleSize): Unit
      }
      .start()
}
