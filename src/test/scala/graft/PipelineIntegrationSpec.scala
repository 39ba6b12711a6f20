package graft

import graft.operators.{Bundler, EntityVersioner}
import graft.queries.GraphLoad
import graft.sources.EntityChanges
import org.apache.spark.sql.functions._

/** End-to-end integration: the full reference pipeline chained through
  * the physical storage layout — change stream → SCD2 versioning →
  * bundled partitioned store → read-back → time-travel — must agree
  * with the direct in-memory computation.
  */
class PipelineIntegrationSpec extends SparkSpec {

  test("scd2 -> bundled store -> read-back -> as-of equals the direct lookup") {
    val out = java.nio.file.Files.createTempDirectory("graft_store").toString
    val changes = EntityChanges.changes(spark, sf)

    // build + persist the version store partitioned by start-block bundle
    val versions = EntityVersioner.scd2Versions(changes)
      .withColumnRenamed("start_block", "block_num")
    Bundler.writeBundled(versions, bundleSize = 250, outDir = out)

    // read back through the physical layout and time-travel at B
    val store = spark.read.parquet(out)
      .withColumnRenamed("block_num", "start_block")
    val b = GraphLoad.AsofBlock
    val got = store
      .filter(col("start_block") <= b &&
        (col("end_block").isNull || col("end_block") > b))
      .select("id", "start_block", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    val want = GraphLoad.glAsofLookup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want && got.nonEmpty)
  }
}
