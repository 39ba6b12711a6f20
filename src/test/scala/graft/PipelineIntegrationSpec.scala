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

  test("run composition: proto replay -> decode -> bundle assign + scd2 + poi + csv -> read-back == the batch keys") {
    // the reference `run` command's FULL fan-out as ONE chain
    // (sinker/sinker.go:100-180): per-block EntityChanges protobuf
    // payloads replay on a stream; the stream decodes them map-only,
    // and THREE consumers ride the same decoded flow exactly like the
    // sinker's handleBlockScopedData — SCD2 version closing, the POI
    // digest, and the bundled graph-CSV store — each of which must
    // reproduce its piecewise-gated batch key, with the CSV read back
    // through GraphCsvReader byte-identically.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.ProtoEntityChanges
    import graft.sources.ProtoEntityChanges.{PbChange, PbField, PbValue}
    import graft.sources.GraphqlSchema.{EntityDesc, Field, FieldType}
    import graft.streaming.{BundledCsvSink, EntityChangeStream, PoiStream}
    import graft.streaming.PoiStream.BlockEvent
    graft.plans.GraftExtensions.ensureRegistered(spark)

    // STEP 0 — the manifest gate `run` applies before any byte flows
    // (run.go:70-117): decode the .spkg from wire bytes, resolve the
    // requested output module, refuse anything that is not an
    // EntityChanges map. The replay below exists only because this
    // passed — and pointing the same run at the store module fails
    // fast the way run.go:116 does.
    import graft.sources.SpkgManifest
    import graft.sources.SpkgManifest.{ModuleInput, Spkg, SpkgModule}
    val spkgBytes = SpkgManifest.encode(Spkg(1L, "events_sink", "v1.0.0", Seq(
      SpkgModule("store_index", "store", "", 0L,
        Seq(ModuleInput("source", "sf.ethereum.type.v2.Block"))),
      SpkgModule("graph_out", "map",
        "proto:" + SpkgManifest.SupportedModuleType, 0L,
        Seq(ModuleInput("source", "sf.ethereum.type.v2.Block"),
          ModuleInput("store", "store_index"))))))
    val pkg = SpkgManifest.decode(spkgBytes)
    assert(SpkgManifest.outputModule(pkg, "graph_out").isRight)
    assert(SpkgManifest.moduleGraph(pkg, "graph_out")
      === Right(Seq("store_index", "graph_out")))
    assert(SpkgManifest.startBlock(pkg, "graph_out") === Right(0L))
    assert(SpkgManifest.outputModule(pkg, "store_index").isLeft)

    // replayed prefix: every block_num in [0, Cut) — 30 COMPLETE poi
    // blocks at PoiBlockSize=10, 3 complete csv bundles at 100
    val Cut = 300L
    val CsvBundle = 100L
    val tsBase = 1700000000000L
    val subset = EntityChanges.changes(spark, sf)
      .filter(col("block_num") < Cut)
      .select("id", "block_num", "op", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(subset.nonEmpty)
    val subsetDf = subset.toSeq.toDF("id", "block_num", "op", "value")
    val opCode = Map("CREATE" -> "OPERATION_CREATE",
      "UPDATE" -> "OPERATION_UPDATE", "DELETE" -> "OPERATION_DELETE")
    // one EntityChanges payload per block — the unit the sinker
    // unmarshals per BlockScopedData (sinker.go:213-214)
    val payloads = subset.groupBy(_._2).toSeq.map { case (bn, rows) =>
      (bn, ProtoEntityChanges.encode(rows.map { case (id, _, op, v) =>
        PbChange("Event", id, 0L, opCode(op),
          Seq(PbField("value", Some(PbValue("Bigdecimal", v.toString)))))
      }))
    }.sortBy(_._1)
    // watermark sentinels: far-future blocks whose event time closes
    // every real poi block (fresh ids — they close no corpus version)
    val sentinels = Seq(99990L, 100000L).map { bn =>
      (bn, ProtoEntityChanges.encode(Seq(PbChange("Event", s"sentinel$bn", 0L,
        "OPERATION_CREATE", Seq(PbField("value", Some(PbValue("Bigdecimal", "0.0"))))))))
    }

    val input = MemoryStream[(Long, Array[Byte])]
    val decoded = input.toDF().toDF("block_num", "payload")
      .select(col("block_num"),
        explode(call_function("graft_entity_changes", col("payload"))).as("c"))
      .select(col("c.id").as("id"), col("block_num"),
        when(col("c.op") === "OPERATION_CREATE", "CREATE")
          .when(col("c.op") === "OPERATION_DELETE", "DELETE")
          .otherwise("UPDATE").as("op"),
        col("c.fields").getItem(0).getField("value").cast("double").as("value"))

    val pbs = GraphLoad.PoiBlockSize
    val csvDir = java.nio.file.Files.createTempDirectory("graft_run_csv").toString
    val qScd2 = EntityChangeStream.closedVersions(
        decoded.select(col("id"), col("block_num").as("blockNum"),
          col("op"), col("value")).as[EntityChangeStream.Change])
      .writeStream.format("memory").queryName("run_versions")
      .outputMode("append").start()
    val qPoi = PoiStream.blockDigests(
        decoded.select(expr(s"block_num DIV $pbs").as("block"),
            col("block_num").as("blockNum"),
            concat(col("op"), lit(":"), col("id"), lit(":"),
              col("value").cast("decimal(20,2)").cast("string")).as("repr"),
            timestamp_millis(lit(tsBase) + expr(s"block_num DIV $pbs") * 10000).as("ts"))
          .withWatermark("ts", "15 seconds").as[BlockEvent])
      .writeStream.format("memory").queryName("run_poi")
      .outputMode("append").start()
    // operational telemetry rides the SAME foreachBatch seam the CSV
    // sink uses (the sinker records stats per handled BlockScopedData,
    // sinker.go:270-271) — gl_sink_metrics proven on the real
    // composed pipeline, not a synthetic feed
    val metrics = new graft.streaming.SinkMetrics
    val qCsv = decoded.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        metrics.record(b.withColumn("entity", lit("Event")))
        BundledCsvSink.writeBatch(b, id, csvDir, CsvBundle): Unit
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_run_ckpt").toString)
      .start()
    val all = Seq(qScd2, qPoi, qCsv)
    try {
      // replay in 4 rate-limited waves, sentinels last
      (payloads.grouped((payloads.size + 2) / 3).toSeq :+ sentinels).foreach { wave =>
        input.addData(wave); all.foreach(_.processAllAvailable())
      }

      // 1. bundle assign: the store's directory layout IS glBundleAssign
      val bundleDirs = new java.io.File(csvDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bundle="))
        .map(_.getName.stripPrefix("bundle=").toLong).toSet
      val wantBundles = graft.operators.Bundler.bundleAssign(subsetDf, CsvBundle)
        .select("bundle").distinct().collect().map(_.getLong(0)).toSet
      assert(bundleDirs.filter(_ < Cut / CsvBundle) === wantBundles)

      // 2. streamed SCD2 == batch scd2Versions' closed versions
      val gotV = spark.table("run_versions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .filter(v => v._1.nonEmpty && !v._1.startsWith("sentinel")).toSet
      val wantV = EntityVersioner.scd2Versions(subsetDf)
        .filter(col("end_block").isNotNull).collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
          r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
      assert(gotV === wantV)
      assert(gotV.nonEmpty)

      // 3. streamed POI == the batch key over the same complete blocks
      val gotP = spark.table("run_poi").filter(col("block") < Cut / pbs)
        .collect().map(r => (r.getAs[Long]("block"), r.getAs[String]("digest"))).toMap
      val wantP = GraphLoad.glPoiBlockDigest(spark, sf)
        .filter(col("block") < Cut / pbs).collect()
        .map(r => (r.getAs[Long]("block"), r.getAs[String]("digest"))).toMap
      assert(gotP === wantP)
      assert(gotP.size === (Cut / pbs).toInt)

      // 4. the stored CSV is byte-identical to the batch serialization
      val gotLines = spark.read.textFile(s"$csvDir/bundle=*")
        .collect().toSeq
      val wantLines = BundledCsvSink.toCsvLines(subsetDf, CsvBundle)
        .select("line").collect().map(_.getString(0)).toSeq
      val sentinelLines = gotLines.filterNot(l =>
        wantLines.contains(l)) // only the 2 sentinel rows may remain
      assert(sentinelLines.forall(_.startsWith("sentinel")), sentinelLines.take(3))
      assert(gotLines.sorted.diff(sentinelLines.sorted) === wantLines.sorted)

      // 4b. the telemetry fold saw exactly what flowed: every decoded
      // change counted once, head block = the last sentinel, blocks =
      // distinct block_nums delivered, no undo signals on this stream
      val snap = metrics.snapshot(spark).collect()
      assert(snap.length === 1 && snap(0).getString(0) === "Event")
      assert(snap(0).getLong(1) === subset.length.toLong + 2L) // + sentinels
      assert(snap(0).getLong(3) === 100000L)
      assert(snap(0).getLong(5) ===
        subset.map(_._2).distinct.length.toLong + 2L)
      assert(snap(0).getLong(7) === 0L)

      // 5. read-back through GraphCsvReader's typed parse reproduces
      // the decoded change rows (the loader's view of the store)
      val desc = EntityDesc("event", Map(
        "id" -> Field("id", FieldType.Id, nullable = false, array = false),
        "value" -> Field("value", FieldType.BigDecimal, nullable = false, array = false)),
        immutable = true)
      val raw = spark.read
        .schema("id STRING, `block$` STRING, value STRING")
        .csv(s"$csvDir/bundle=*")
      val back = graft.sources.GraphCsvReader.readEntity(raw, desc)
        .filter(!col("id").startsWith("sentinel"))
        .select(col("id"), col("start_block"),
          col("value").cast("decimal(20,2)").cast("string")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      val wantBack = subsetDf
        .select(col("id"), col("block_num"),
          col("value").cast("decimal(20,2)").cast("string")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
      assert(back === wantBack)
    } finally all.foreach(_.stop())
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
