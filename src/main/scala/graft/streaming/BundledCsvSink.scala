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

  /** Exactly-once per-batch write. `foreachBatch` is at-least-once: on
    * recovery the last in-flight micro-batch replays with the SAME
    * batch id. Protocol (the reference bundler's write-then-upload,
    * made idempotent):
    *
    *   1. committed marker present → no-op;
    *   2. sweep any `batch-<id>-*` files a previously crashed attempt
    *      already moved into the bundle dirs (they carry the batch id
    *      in their name precisely so a replay can find them);
    *   3. write the batch under `_staging/batch-<id>` (overwrite);
    *   4. move every part file into its final bundle dir under a
    *      batch-prefixed name;
    *   5. write the committed marker.
    *
    * A crash at any step leaves either a marker (done) or replayable
    * debris keyed by batch id (redone cleanly). Returns false when the
    * batch was already committed. */
  def writeBatch(batch: DataFrame, batchId: Long, outDir: String,
                 bundleSize: Long): Boolean = {
    import org.apache.hadoop.fs.Path
    val out = new Path(outDir)
    val marker = new Path(outDir, s"_committed/batch-$batchId")
    val fs = marker.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      val prefix = s"batch-$batchId-"
      val staging = new Path(outDir, s"_staging/batch-$batchId")
      toCsvLines(batch, bundleSize)
        .repartition(col("bundle"))
        .write.mode("overwrite").partitionBy("bundle").text(staging.toString)
      fs.listStatus(staging).filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("bundle=")).foreach { d =>
        val dest = new Path(out, d.getPath.getName)
        if (!fs.mkdirs(dest))
          throw new java.io.IOException(s"mkdirs failed: $dest")
        // sweep only THIS batch's destination dirs: a crashed attempt
        // can only have moved files into dirs of the same bundle set
        // (same data, same ids), so the replay sweep is O(batch
        // bundles), never a scan of the whole output
        fs.listStatus(dest)
          .filter(_.getPath.getName.startsWith(prefix))
          .foreach(f => fs.delete(f.getPath, false))
        fs.listStatus(d.getPath)
          .filter(_.getPath.getName.startsWith("part-"))
          .foreach { f =>
            val to = new Path(dest, prefix + f.getPath.getName)
            // Hadoop rename reports most failures by RETURNING FALSE;
            // ignoring it would delete the staged file below, mark the
            // batch committed, and silently lose its rows
            if (!fs.rename(f.getPath, to))
              throw new java.io.IOException(s"rename failed: ${f.getPath} -> $to")
          }
      }
      fs.delete(staging, true)
      if (!fs.mkdirs(marker.getParent))
        throw new java.io.IOException(s"mkdirs failed: ${marker.getParent}")
      fs.create(marker, true).close()
      true
    }
  }

  /** Batch ids whose committed marker exists — the reader's visibility
    * set. */
  def committedBatchIds(outDir: String,
                        conf: org.apache.hadoop.conf.Configuration): Set[Long] = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(outDir, "_committed")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case s if s.startsWith("batch-") => s.stripPrefix("batch-").toLong }
      .toSet
  }

  /** The READER CONTRACT that makes the roll atomic: only files whose
    * batch id carries a committed marker are visible. This is the
    * consumer half of the reference's boundary state machine
    * (bundler/writer/buffered.go:47-98): there, a boundary's rows
    * accumulate in an invisible working `.tmp` file and become
    * consumable only when CloseBoundary hands the finished object to
    * the atomic upload under its final name. Here the rename-then-mark
    * protocol of [[writeBatch]] plays StartBoundary/CloseBoundary, and
    * the marker is the "final name" event — a crash at ANY point
    * (staged only, some part files moved, all moved but unmarked)
    * leaves the batch id unmarked, so its debris is dark to readers
    * until the replay sweeps and completes it. Gated by the
    * crash-mid-bundle specs in BundledWriteSpec. */
  def committedLines(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val ids = committedBatchIds(outDir, conf)
    val out = new Path(outDir)
    val fs = out.getFileSystem(conf)
    val files: Seq[String] =
      if (!fs.exists(out)) Nil
      else fs.listStatus(out).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("bundle="))
        .flatMap { d =>
          fs.listStatus(d.getPath).toSeq.filter { f =>
            val n = f.getPath.getName
            n.startsWith("batch-") && n.split('-').lift(1).exists(
              s => s.nonEmpty && s.forall(_.isDigit) && ids.contains(s.toLong))
          }.map(_.getPath.toString)
        }
    if (files.isEmpty) {
      import spark.implicits._
      Seq.empty[(Long, String)].toDF("bundle", "line")
    } else
      spark.read.text(files: _*)
        .select(
          regexp_extract(input_file_name(), "bundle=(\\d+)/", 1)
            .cast("long").as("bundle"),
          col("value").as("line"))
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
