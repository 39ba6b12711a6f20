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
}
