package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bundle (block-range file) assignment (SURVEY.md §2 #5, #17).
  *
  * The reference writes one file per `[k·bundleSize, (k+1)·bundleSize)`
  * block range (reference bundler/bundler.go:181-203,
  * csvprocessor/writer.go:35-99 `newExclusiveRangeContaining`), and
  * `tocsv` validates that consecutive files are contiguous
  * (processor.go:114-147).
  *
  * Spark-first: the bundle key is `block_num div bundleSize` — a
  * deterministic, order-free computation, so bundling is a projection
  * (no shuffle); the physical file layout at scale is
  * `df.write.partitionBy("bundle")`, which scales with block height and
  * bounds file size by bundleSize.
  */
object Bundler {

  /** #5 gl_bundle_assign — per-bundle manifest: file range + stats.
    * One hash-agg shuffle of |bundles| rows (tiny: height/bundleSize). */
  def bundleAssign(changes: DataFrame, bundleSize: Long): DataFrame =
    changes
      .withColumn("bundle", expr(s"block_num div $bundleSize"))
      .groupBy(col("bundle"))
      .agg(
        count(lit(1)).as("n_changes"),
        min(col("block_num")).as("min_block"),
        max(col("block_num")).as("max_block")
      )
      .withColumn("file_start", col("bundle") * bundleSize)
      .withColumn("file_end", col("bundle") * bundleSize + (bundleSize - 1))
      .select("bundle", "file_start", "file_end", "n_changes", "min_block", "max_block")

  /** #17 gl_range_contiguity — the reference's file-walk contiguity
    * check (`startBlockNum != endRange+1` → broken, processor.go:128-131)
    * over the bundle manifest: `lag(file_end)` vs `file_start`.
    * The manifest is tiny, so the single-partition window is fine even
    * at 100 TB (|bundles| = height/bundleSize). */
  def rangeContiguity(changes: DataFrame, bundleSize: Long): DataFrame = {
    val manifest = bundleAssign(changes, bundleSize)
    val w = Window.orderBy("bundle")
    manifest
      .withColumn("prev_end", lag(col("file_end"), 1).over(w))
      .withColumn("contiguous",
        col("prev_end").isNull || col("file_start") === col("prev_end") + 1)
      .select("bundle", "file_start", "file_end", "prev_end", "contiguous")
  }

  /** Physical bundled write — the scale path for the reference's
    * one-file-per-range layout: parquet/csv partitioned by bundle.
    * Used by the streaming sink and available to batch callers. */
  def writeBundled(changes: DataFrame, bundleSize: Long, outDir: String, format: String = "parquet"): Unit =
    changes
      .withColumn("bundle", expr(s"block_num div $bundleSize"))
      .repartition(col("bundle"))
      .write.mode("overwrite")
      .partitionBy("bundle")
      .format(format)
      .save(outDir)

  /** Compact a bundled store in place-adjacent: streaming appends (one
    * file per micro-batch per bundle) accumulate small files — the
    * classic object-store pathology. Rewrite with one task per bundle,
    * rows sorted by block within the file for range-scan locality, file
    * size bounded by `maxRecordsPerFile`. */
  def compactBundles(spark: org.apache.spark.sql.SparkSession,
                     storeDir: String, compactedDir: String,
                     maxRecordsPerFile: Long): Unit =
    spark.read.parquet(storeDir)
      .repartition(col("bundle"))
      .sortWithinPartitions(col("bundle"), col("block_num"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bundle")
      .parquet(compactedDir)

  /** Marker written inside the staged rewrite AFTER the row-count gate
    * passes. Our own marker, not Hadoop's `_SUCCESS` — deployments
    * commonly disable `mapreduce.fileoutputcommitter.marksuccessfuljobs`
    * on object stores, and recovery must not depend on that setting;
    * it also proves the integrity gate ran, which `_SUCCESS` (written
    * at job commit, before the gate) does not. */
  private val StagedMarker = "_graft_staged"

  /** In-place compaction by stage-and-swap: rewrite the store into
    * `<store>.compact.tmp`, verify row counts, then swap it in with two
    * checked renames. Readers either see the old store or the new one —
    * never a half-written mix — and a crash at ANY step is recoverable:
    *
    *   - crash while staging or before the integrity gate → `.tmp`
    *     lacks the [[StagedMarker]]; next run deletes the debris and
    *     restages;
    *   - crash between the two swap renames (the only window where the
    *     store path is absent) → `.tmp` is complete and marker-gated;
    *     next run (or [[recoverCompaction]]) finishes the swap;
    *   - crash before the final cleanup → `.compact.old` remains; next
    *     run deletes it.
    *
    * If the store is absent and no complete staged rewrite exists this
    * ABORTS rather than touching anything — deleting `.tmp` in that
    * state could destroy the only copy of the data.
    *
    * Writer exclusion is the caller's contract: compaction is a
    * maintenance operation on a quiesced store. An append landing
    * between the staging read and the swap rename would be carried to
    * `.compact.old` and deleted with it — pause the streaming sink (or
    * any other writer) for the duration, exactly as the reference's
    * loader assumes exclusive ownership of its bundle directory.
    *
    * Rename results are CHECKED — Hadoop reports most failures by
    * returning false, and ignoring that here would drop the store. */
  def compactBundlesInPlace(spark: org.apache.spark.sql.SparkSession,
                            storeDir: String, maxRecordsPerFile: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val store = new Path(storeDir)
    val tmp = new Path(storeDir + ".compact.tmp")
    val old = new Path(storeDir + ".compact.old")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (recoverCompaction(spark, storeDir)) return
    if (!fs.exists(store)) throw new java.io.IOException(
      s"store $store is absent and no complete staged rewrite exists — " +
        "refusing to proceed (a half-staged .compact.tmp may be all that remains; " +
        "inspect it manually rather than letting a fresh attempt delete it)")
    // fresh attempt: clear debris from any prior crashed attempt
    fs.delete(tmp, true)
    fs.delete(old, true)
    compactBundles(spark, storeDir, tmp.toString, maxRecordsPerFile)
    // integrity gate before the swap — a lost task/partition would
    // otherwise silently shrink the store
    val before = spark.read.parquet(storeDir).count()
    val after = spark.read.parquet(tmp.toString).count()
    if (before != after) throw new java.io.IOException(
      s"compaction row count mismatch: store=$before compacted=$after; leaving store untouched")
    fs.create(new Path(tmp, StagedMarker), true).close()
    if (!fs.rename(store, old))
      throw new java.io.IOException(s"rename failed: $store -> $old")
    if (!fs.rename(tmp, store))
      throw new java.io.IOException(
        s"rename failed: $tmp -> $store (store preserved at $old)")
    fs.delete(new Path(store, StagedMarker), false)
    fs.delete(old, true)
  }

  /** Finish a compaction swap interrupted between its two renames:
    * store absent + complete (marker-gated) staged rewrite present →
    * move the staged rewrite in. Returns true when a swap was completed
    * (store is now the compacted data), false when there was nothing to
    * recover. Called automatically by [[compactBundlesInPlace]]. */
  def recoverCompaction(spark: org.apache.spark.sql.SparkSession,
                        storeDir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val store = new Path(storeDir)
    val tmp = new Path(storeDir + ".compact.tmp")
    val old = new Path(storeDir + ".compact.old")
    val fs = store.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpComplete = fs.exists(new Path(tmp, StagedMarker))
    if (!fs.exists(store) && tmpComplete) {
      if (!fs.rename(tmp, store))
        throw new java.io.IOException(s"rename failed: $tmp -> $store")
      fs.delete(new Path(store, StagedMarker), false)
      fs.delete(old, true)
      true
    } else false
  }
}
