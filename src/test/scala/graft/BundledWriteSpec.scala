package graft

import graft.operators.Bundler
import graft.sources.EntityChanges
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class BundledWriteSpec extends SparkSpec {

  test("bundled write lays out one directory per block range and prunes on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_bundles").toString
    val changes = EntityChanges.changes(spark, sf)
    Bundler.writeBundled(changes, bundleSize = 250, outDir = out)

    // layout: bundle=k directories covering the block height
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bundle=")).sorted
    assert(dirs.sameElements((0 to 3).map(b => s"bundle=$b")), dirs.mkString(","))

    // a single-bundle read PRUNES: only that partition's files scanned
    val one = spark.read.parquet(out).filter(col("bundle") === 2)
    val plan = one.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(bundle"), plan)
    assert(one.count() ===
      changes.filter(col("block_num") >= 500 && col("block_num") < 750).count())

    // round trip: nothing lost
    assert(spark.read.parquet(out).count() === changes.count())
  }

  test("compaction merges micro-batch file fragments per bundle") {
    val store = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val compacted = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val changes = EntityChanges.changes(spark, sf)
      .withColumn("bundle", expr("block_num div 250"))
    // simulate 5 micro-batch appends -> many small files per bundle
    (0 until 5).foreach { i =>
      changes.filter(col("block_num") % 5 === i)
        .repartition(2)
        .write.mode("append").partitionBy("bundle").parquet(store)
    }
    def filesPerBundle(dir: String): Map[String, Int] =
      new java.io.File(dir).listFiles().filter(_.isDirectory)
        .filter(_.getName.startsWith("bundle="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPerBundle(store).values.forall(_ >= 5), filesPerBundle(store).toString)

    Bundler.compactBundles(spark, store, compacted, maxRecordsPerFile = 1000000)
    assert(filesPerBundle(compacted).values.forall(_ === 1), filesPerBundle(compacted).toString)
    assert(spark.read.parquet(compacted).count() === changes.count())
  }

  test("in-place compaction swaps atomically and leaves no staging debris") {
    val store = java.nio.file.Files.createTempDirectory("graft_inplace").toString
    val changes = EntityChanges.changes(spark, sf)
      .withColumn("bundle", expr("block_num div 250"))
    (0 until 4).foreach { i =>
      changes.filter(col("block_num") % 4 === i)
        .repartition(2)
        .write.mode("append").partitionBy("bundle").parquet(store)
    }
    val want = changes.count()
    Bundler.compactBundlesInPlace(spark, store, maxRecordsPerFile = 1000000)
    assert(spark.read.parquet(store).count() === want)
    val perBundle = new java.io.File(store).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("bundle="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(perBundle.values.forall(_ === 1), perBundle.toString)
    // swap cleanup: neither the staged rewrite nor the displaced store remain
    assert(!new java.io.File(store + ".compact.tmp").exists())
    assert(!new java.io.File(store + ".compact.old").exists())
  }

  test("a crash between the swap renames is recovered, not recompacted") {
    import org.apache.hadoop.fs.Path
    val store = java.nio.file.Files.createTempDirectory("graft_recover").toString
    val changes = EntityChanges.changes(spark, sf)
      .withColumn("bundle", expr("block_num div 250"))
    changes.write.mode("overwrite").partitionBy("bundle").parquet(store)
    val want = changes.count()
    // stage a complete rewrite (with the post-gate marker, as the real
    // crash window has it), then simulate the crash: store renamed
    // away, staged rewrite not yet moved in
    Bundler.compactBundles(spark, store, store + ".compact.tmp", maxRecordsPerFile = 1000000)
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new Path(store + ".compact.tmp", "_graft_staged"), true).close()
    assert(fs.rename(new Path(store), new Path(store + ".compact.old")))
    assert(Bundler.recoverCompaction(spark, store))
    assert(spark.read.parquet(store).count() === want)
    assert(!new java.io.File(store + ".compact.tmp").exists())
    assert(!new java.io.File(store + ".compact.old").exists())
    // idempotent: nothing left to recover
    assert(!Bundler.recoverCompaction(spark, store))
  }

  test("compaction refuses to touch a half-staged rewrite when the store is absent") {
    val store = java.nio.file.Files.createTempDirectory("graft_absent").toString + "/store"
    // a .tmp WITHOUT the completion marker next to a missing store: the
    // tmp may be the only copy of the data — must abort, not delete it
    val tmp = new java.io.File(store + ".compact.tmp")
    assert(tmp.mkdirs())
    java.nio.file.Files.writeString(tmp.toPath.resolve("part-00000.parquet"), "x")
    assert(!Bundler.recoverCompaction(spark, store)) // no marker → not recoverable
    val ex = intercept[java.io.IOException] {
      Bundler.compactBundlesInPlace(spark, store, maxRecordsPerFile = 1000000)
    }
    assert(ex.getMessage.contains("refusing to proceed"), ex.getMessage)
    assert(tmp.exists(), "the half-staged rewrite must be preserved for inspection")
  }

  test("crash mid-bundle: partial batch debris is never visible; replay completes exactly-once") {
    import graft.streaming.BundledCsvSink
    import org.apache.hadoop.fs.Path
    val out = java.nio.file.Files.createTempDirectory("graft_torn").toString
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val changes = EntityChanges.changes(spark, sf)
    val b1 = changes.filter(col("block_num") < 400)
    val b2 = changes.filter(col("block_num") >= 400)
    def lines(df: org.apache.spark.sql.DataFrame) =
      BundledCsvSink.toCsvLines(df, 250).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
    def visible() = BundledCsvSink.committedLines(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap

    // boundary 1 closes normally
    assert(BundledCsvSink.writeBatch(b1, 1L, out, 250))
    assert(visible() === lines(b1))

    // boundary 2 CRASHES mid-close: rows staged, ONE part file already
    // renamed into a final bundle dir, marker never written — the
    // working-file state the reference's buffered writer leaves on
    // disk when it dies between CloseBoundary and upload
    val staging = new Path(out, "_staging/batch-2")
    BundledCsvSink.toCsvLines(b2, 250)
      .repartition(col("bundle"))
      .write.mode("overwrite").partitionBy("bundle").text(staging.toString)
    val firstDir = fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("bundle=")).head.getPath
    val firstPart = fs.listStatus(firstDir)
      .filter(_.getPath.getName.startsWith("part-")).head.getPath
    val dest = new Path(out, firstDir.getName)
    fs.mkdirs(dest)
    assert(fs.rename(firstPart, new Path(dest, s"batch-2-${firstPart.getName}")))

    // NO partial bundle is visible: the committed reader still sees
    // exactly boundary 1 — the torn write is dark
    assert(visible() === lines(b1))

    // recovery: the replayed micro-batch (same id) sweeps the partial
    // rename, re-stages, completes, marks — rows exactly once
    assert(BundledCsvSink.writeBatch(b2, 2L, out, 250))
    assert(visible() === lines(changes))
    // a second replay is a marker no-op, still exactly once
    assert(!BundledCsvSink.writeBatch(b2, 2L, out, 250))
    assert(visible() === lines(changes))
  }

  test("crash before any move: staged-only boundary is invisible and replays cleanly") {
    import graft.streaming.BundledCsvSink
    import org.apache.hadoop.fs.Path
    val out = java.nio.file.Files.createTempDirectory("graft_torn2").toString
    val changes = EntityChanges.changes(spark, sf)
    // the crash happened right after StartBoundary + writes: all rows
    // sit in the working area, nothing renamed, no marker
    val staging = new Path(out, "_staging/batch-0")
    BundledCsvSink.toCsvLines(changes, 250)
      .repartition(col("bundle"))
      .write.mode("overwrite").partitionBy("bundle").text(staging.toString)
    assert(BundledCsvSink.committedLines(spark, out).count() === 0L)
    assert(BundledCsvSink.writeBatch(changes, 0L, out, 250))
    val vis = BundledCsvSink.committedLines(spark, out)
    assert(vis.count() === changes.count())
  }
}
