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
}
