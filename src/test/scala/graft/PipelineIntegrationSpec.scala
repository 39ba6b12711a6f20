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

  test("curation chain: cluster -> keep-best -> deduped corpus -> packing is consistent") {
    import graft.queries.{Dedup, TextAnalysis}
    val docs = Tables.documents(spark, sf)
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet

    // near-dup clusters and their canonical representatives
    val members = Dedup.ddCluster(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val keep = Dedup.ddKeepBest(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("keep_id")).toMap
    // exactly one representative per cluster, drawn from its members
    assert(keep.keySet === members.map(_._2).toSet)
    keep.foreach { case (cid, kid) => assert(members.contains(kid -> cid), s"cluster $cid") }

    // the deduped corpus: non-clustered docs + one representative each
    val clustered = members.map(_._1).toSet
    val survivors = (allIds -- clustered) ++ keep.values
    assert(survivors.size === allIds.size - clustered.size + keep.size)

    // pack the surviving corpus; layout must be gapless per shard in
    // doc_id order and bin sequences from the running start offsets
    val packed = TextAnalysis.packSequences(
      docs.filter(col("doc_id").isin(survivors.toSeq: _*)),
      TextAnalysis.PackShards, TextAnalysis.PackBudget).collect()
    assert(packed.map(_.getAs[Long]("doc_id")).toSet === survivors)
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      var cursor = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("start_tok") === cursor, s"doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("seq_in_shard") === cursor / TextAnalysis.PackBudget)
        cursor += r.getAs[Long]("n_tok")
      }
    }
  }
}
