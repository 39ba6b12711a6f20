package graft

import graft.queries.GraphLoad
import graft.sources.EntityChanges
import graft.streaming.{BundledCsvSink, EntityChangeStream}
import graft.streaming.EntityChangeStream.Change
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  private def allChanges: Seq[Change] = {
    EntityChanges.changes(spark, sf).collect().map { r =>
      Change(r.getAs[String]("id"), r.getAs[Long]("block_num"),
        r.getAs[String]("op"), r.getAs[Double]("value"))
    }.toSeq.sortBy(_.blockNum)
  }

  test("streaming squash emits exactly the batch SCD2 closed versions") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Change]
    val q = EntityChangeStream.closedVersions(input.toDS())
      .writeStream.format("memory").queryName("closed_versions")
      .outputMode("append").start()
    try {
      // feed in three micro-batches split on block number — closures that
      // span batch boundaries must come out of the state store
      val (b1, rest) = allChanges.splitAt(300)
      val (b2, b3) = rest.splitAt(300)
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }

      val got = spark.table("closed_versions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val want = GraphLoad.glScd2Versions(spark, sf)
        .filter(col("end_block").isNotNull).collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
          r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("store-bootstrapped stream: prefix batch + seeded suffix stream == full history") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import EntityChangeStream.OpenRow
    // split history at a block boundary: the prefix is "the store",
    // the suffix is the live feed a restarted sink consumes
    val all = allChanges
    val splitBlock = all.map(_.blockNum).distinct.sorted
      .apply(all.map(_.blockNum).distinct.length / 2)
    val (prefix, suffix) = all.partition(_.blockNum < splitBlock)
    // batch SCD2 over the prefix = the persisted store; its live rows
    // (end_block null) seed the stream, its closed rows are already
    // on disk
    val store = graft.operators.EntityVersioner.scd2Versions(
      prefix.toDF("id", "block_num", "op", "value"))
    val storeClosed = store.filter(col("end_block").isNotNull).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
        r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
    val open = store.filter(col("end_block").isNull)
      .select(col("id"), col("start_block"), col("value")).collect()
      .map(r => OpenRow(r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(open.nonEmpty) // the handshake is vacuous without live rows
    val input = MemoryStream[Change]
    val q = EntityChangeStream.closedVersionsFrom(input.toDS(), open.toDS())
      .writeStream.format("memory").queryName("resumed_versions")
      .outputMode("append").start()
    try {
      suffix.grouped(math.max(suffix.length / 3, 1)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("resumed_versions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      // a version SPANNING the split must close with its store-side
      // start block — proof the seed was actually consulted
      assert(streamed.exists { case (_, s, e, _) => s < splitBlock && e >= splitBlock })
      val want = GraphLoad.glScd2Versions(spark, sf)
        .filter(col("end_block").isNotNull).collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
          r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
      assert(storeClosed ++ streamed === want)
      assert((storeClosed & streamed).isEmpty) // no double emission
    } finally q.stop()
  }

  test("reorg stream emits exactly the batch SCD2 closed versions of the canonical chain") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import EntityChangeStream.{SeqChange, blockTs, undoFor}
    def ch(id: String, seq: Long, b: Long, op: String, v: Double) =
      SeqChange(id, seq, b, op, v, blockTs(b))

    val input = MemoryStream[SeqChange]
    val q = EntityChangeStream.closedVersionsWithUndo(input.toDS(), reorgThresholdBlocks = 5)
      .writeStream.format("memory").queryName("undo_versions")
      .outputMode("append").start()
    try {
      // delivered chain head reaches block 10, then a 3-block reorg ...
      input.addData(Seq(
        ch("u1", 1, 1, "CREATE", 1.0), ch("u2", 2, 2, "CREATE", 2.0),
        ch("u1", 3, 4, "UPDATE", 1.1), ch("u3", 4, 6, "CREATE", 3.0),
        ch("u2", 5, 8, "UPDATE", 2.1), ch("u1", 6, 9, "UPDATE", 1.2),
        ch("u3", 7, 10, "DELETE", 0.0)))
      q.processAllAvailable()
      // ... undoes everything above block 7 (fan-out to the delivered ids)
      input.addData(undoFor(Seq("u1", "u2", "u3"), seq = 8, lastValidBlock = 7))
      q.processAllAvailable()
      // canonical replacement blocks, then deletes to close every version
      input.addData(Seq(
        ch("u1", 9, 8, "UPDATE", 5.1), ch("u2", 10, 9, "UPDATE", 5.2),
        ch("u3", 11, 12, "DELETE", 0.0), ch("u1", 12, 13, "DELETE", 0.0),
        ch("u2", 13, 14, "DELETE", 0.0)))
      q.processAllAvailable()
      // sentinels push the watermark far past block 14 and fire timeouts
      input.addData(Seq(ch("zz", 14, 40, "CREATE", 0.0))); q.processAllAvailable()
      input.addData(Seq(ch("zz", 15, 41, "UPDATE", 0.0))); q.processAllAvailable()

      val got = spark.table("undo_versions").as[EntityChangeStream.Version]
        .collect().map(v => (v.id, v.startBlock, v.endBlock, v.value)).toSet

      // batch SCD2 over the CANONICAL chain (reorged blocks 8-10 replaced)
      val canonical = Seq(
        ("u1", 1L, "CREATE", 1.0), ("u2", 2L, "CREATE", 2.0),
        ("u1", 4L, "UPDATE", 1.1), ("u3", 6L, "CREATE", 3.0),
        ("u1", 8L, "UPDATE", 5.1), ("u2", 9L, "UPDATE", 5.2),
        ("u3", 12L, "DELETE", 0.0), ("u1", 13L, "DELETE", 0.0),
        ("u2", 14L, "DELETE", 0.0)
      ).toDF("id", "block_num", "op", "value")
      val want = graft.operators.EntityVersioner.scd2Versions(canonical)
        .filter(col("end_block").isNotNull).collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
          r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
      assert(got === want)
      // versions created by the undone fork must never have been emitted
      assert(!got.exists { case (_, s, _, v) => s >= 8 && (v == 2.1 || v == 1.2) })
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("reorg-aware resume: store-seeded stream survives an undo and matches canonical batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import EntityChangeStream.{OpenRow, SeqChange, blockTs, undoFor}
    def ch(id: String, seq: Long, b: Long, op: String, v: Double) =
      SeqChange(id, seq, b, op, v, blockTs(b))
    // the persisted store: canonical, FINAL history below block 5
    val storeClosed = Set(("u1", 1L, 4L, 1.0))
    val open = Seq(OpenRow("u1", 4, 1.1), OpenRow("u2", 2, 2.0))
    val input = MemoryStream[SeqChange]
    val q = EntityChangeStream.closedVersionsWithUndoFrom(
        input.toDS(), reorgThresholdBlocks = 5, open.toDS())
      .writeStream.format("memory").queryName("resumed_undo_versions")
      .outputMode("append").start()
    try {
      // the resumed feed forks (blocks 8-9), reorgs back to 7, then
      // delivers the canonical replacements — the seeded segments must
      // close with their STORE-side starts and the fork never emit
      input.addData(Seq(ch("u1", 1, 8, "UPDATE", 1.2), ch("u2", 2, 9, "UPDATE", 2.1)))
      q.processAllAvailable()
      input.addData(undoFor(Seq("u1", "u2"), seq = 3, lastValidBlock = 7))
      q.processAllAvailable()
      input.addData(Seq(ch("u1", 4, 8, "UPDATE", 5.1), ch("u2", 5, 9, "DELETE", 0.0),
        ch("u1", 6, 13, "DELETE", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(ch("zz", 7, 40, "CREATE", 0.0))); q.processAllAvailable()
      input.addData(Seq(ch("zz", 8, 41, "UPDATE", 0.0))); q.processAllAvailable()
      val streamed = spark.table("resumed_undo_versions")
        .as[EntityChangeStream.Version].collect()
        .map(v => (v.id, v.startBlock, v.endBlock, v.value)).toSet
      val canonical = Seq(
        ("u1", 1L, "CREATE", 1.0), ("u1", 4L, "UPDATE", 1.1),
        ("u2", 2L, "CREATE", 2.0), ("u1", 8L, "UPDATE", 5.1),
        ("u2", 9L, "DELETE", 0.0), ("u1", 13L, "DELETE", 0.0)
      ).toDF("id", "block_num", "op", "value")
      val want = graft.operators.EntityVersioner.scd2Versions(canonical)
        .filter(col("end_block").isNotNull).collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
          r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
      assert(storeClosed ++ streamed === want)
      // a split-spanning version closed from its STORE-side start
      assert(streamed.contains(("u1", 4L, 8L, 1.1)))
      // fork values rolled back by the undo never reached the output
      assert(!streamed.exists { case (_, _, _, v) => v == 1.2 || v == 2.1 })
    } finally q.stop()
  }

  test("an undo aimed below the store head is clamped to the seeded floor") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import EntityChangeStream.{OpenRow, SeqChange, blockTs, undoFor}
    def ch(id: String, seq: Long, b: Long, op: String, v: Double) =
      SeqChange(id, seq, b, op, v, blockTs(b))
    // store head: u1 live since block 4 — FINAL by construction. An
    // undo claiming last-valid-block 2 (below the head) must roll back
    // only to the head: the seeded segment survives and later closes
    // from its store-side start, instead of being silently dropped
    // (at resume the watermark is 0, so only the floor protects it).
    val open = Seq(OpenRow("u1", 4, 1.1))
    val input = MemoryStream[SeqChange]
    val q = EntityChangeStream.closedVersionsWithUndoFrom(
        input.toDS(), reorgThresholdBlocks = 5, open.toDS())
      .writeStream.format("memory").queryName("floor_undo_versions")
      .outputMode("append").start()
    try {
      // fork + too-deep undo in the FIRST micro-batch: the watermark is
      // still 0 here, so the late-row guard alone cannot reject the
      // undo — only the seeded floor stands between it and the store
      input.addData(Seq(ch("u1", 1, 8, "UPDATE", 1.2)) ++
        undoFor(Seq("u1"), seq = 2, lastValidBlock = 2))
      q.processAllAvailable()
      input.addData(Seq(ch("u1", 3, 9, "UPDATE", 5.1), ch("u1", 4, 13, "DELETE", 0.0)))
      q.processAllAvailable()
      input.addData(Seq(ch("zz", 5, 40, "CREATE", 0.0))); q.processAllAvailable()
      input.addData(Seq(ch("zz", 6, 41, "UPDATE", 0.0))); q.processAllAvailable()
      val streamed = spark.table("floor_undo_versions")
        .as[EntityChangeStream.Version].collect()
        .map(v => (v.id, v.startBlock, v.endBlock, v.value)).toSet
      // the seeded segment closed from its store-side start (survived
      // the too-deep undo), the fork never emitted, the continuation
      // stitched on top — exactly canonical batch over the store head
      assert(streamed === Set(("u1", 4L, 9L, 1.1), ("u1", 9L, 13L, 5.1)))
    } finally q.stop()
  }

  test("late rows below the watermark cannot rewrite finalized streaming state") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.streaming.PoiStream
    import graft.streaming.PoiStream.BlockEvent
    // block-constant event time, per the blockDigests contract
    def ev(block: Long, bn: Long, repr: String) =
      BlockEvent(block, bn, repr, new java.sql.Timestamp(1700000000000L + block * 10000))
    val input = MemoryStream[BlockEvent]
    val withWm = input.toDS().withWatermark("ts", "5 seconds").as[BlockEvent]
    val q = PoiStream.blockDigests(withWm)
      .writeStream.format("memory").queryName("late_poi")
      .outputMode("append").start()
    try {
      input.addData(Seq(ev(1, 10, "a"), ev(1, 11, "b"))); q.processAllAvailable()
      // advance the watermark far past block 1 -> digest finalizes
      input.addData(Seq(ev(9, 90, "x"))); q.processAllAvailable()
      input.addData(Seq(ev(10, 100, "y"))); q.processAllAvailable()
      // a LATE straggler for block 1 must not resurrect it
      input.addData(Seq(ev(1, 12, "late"))); q.processAllAvailable()
      input.addData(Seq(ev(11, 110, "z"))); q.processAllAvailable()
      input.addData(Seq(ev(12, 120, "w"))); q.processAllAvailable()

      val b1 = spark.table("late_poi").filter($"block" === 1).collect()
      assert(b1.length === 1, b1.mkString(", "))
      assert(b1.head.getAs[Int]("nEvents") === 2)
      assert(b1.head.getAs[String]("digest") === PoiStream.digestOf(
        Seq((10L, "a"), (11L, "b"))))
    } finally q.stop()
  }

  test("reorg stream matches batch on randomized reorg scenarios") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import EntityChangeStream.{SeqChange, blockTs, undoFor}
    val rnd = new scala.util.Random(7)

    (1 to 3).foreach { scenario =>
      // random canonical chain with a mid-stream reorg of random depth
      val ids = (1 to 4).map(i => s"e$i")
      val headBlock = 10 + rnd.nextInt(10)
      val depth = 1 + rnd.nextInt(4)
      val lastValid = headBlock - depth
      var seq = 0L
      def next(): Long = { seq += 1; seq }
      def chg(b: Long) = {
        val id = ids(rnd.nextInt(ids.length))
        val op = if (rnd.nextInt(5) == 0) "DELETE" else "UPDATE"
        SeqChange(id, next(), b, op, (b * 10 + scenario).toDouble, blockTs(b))
      }
      val preReorg = (1L to headBlock).map(chg)                 // delivered fork
      val undone = preReorg.filter(_.blockNum > lastValid)
      val undoSeq = next()                                      // undo sits between fork and replacement
      val replacement = ((lastValid + 1) to headBlock)
        .map(b => chg(b)) ++ Seq(chg(headBlock + 1))            // canonical blocks
      // close every version, then push the watermark far ahead
      val closers = ids.zipWithIndex.map { case (id, i) =>
        SeqChange(id, next() + 100, headBlock + 10 + i, "DELETE", 0.0,
          blockTs(headBlock + 10 + i))
      }
      val sentinels = Seq(
        SeqChange("zz", 9000, 500, "UPDATE", 0.0, blockTs(500)),
        SeqChange("zz", 9001, 600, "UPDATE", 0.0, blockTs(600)))

      val input = MemoryStream[SeqChange]
      val q = EntityChangeStream.closedVersionsWithUndo(input.toDS(), 6)
        .writeStream.format("memory").queryName(s"undo_rand_$scenario")
        .outputMode("append").start()
      try {
        input.addData(preReorg); q.processAllAvailable()
        input.addData(undoFor(undone.map(_.id).distinct, undoSeq, lastValid))
        q.processAllAvailable()
        input.addData(replacement); q.processAllAvailable()
        input.addData(closers); q.processAllAvailable()
        sentinels.foreach { sn => input.addData(Seq(sn)); q.processAllAvailable() }

        val got = spark.table(s"undo_rand_$scenario").as[EntityChangeStream.Version]
          .collect().map(v => (v.id, v.startBlock, v.endBlock, v.value)).toSet
        val canonical = (preReorg.filter(_.blockNum <= lastValid) ++
          replacement ++ closers)
          .map(c => (c.id, c.blockNum, c.op, c.value))
          .toDF("id", "block_num", "op", "value")
        val want = graft.operators.EntityVersioner.scd2Versions(canonical)
          .filter(col("end_block").isNotNull).collect()
          .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
            r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
        assert(got === want, s"scenario $scenario (head=$headBlock depth=$depth)")
      } finally q.stop()
    }
  }

  test("bundled csv sink rolls one directory per bundle with all lines") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val input = MemoryStream[Change]
    val changesDf = input.toDS().toDF()
      .select(col("id"), col("blockNum").as("block_num"), col("op"), col("value"))
    val q = BundledCsvSink.start(changesDf, out, ckpt, bundleSize = 250)
    try {
      val (b1, b2) = allChanges.splitAt(500)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    val written = spark.read.text(out)
    assert(written.count() === allChanges.size)
    val bundles = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bundle=")).sorted
    assert(bundles.sameElements((0 to 3).map(b => s"bundle=$b")))
    // spot-check line shape: id,block,value
    val line = written.limit(1).collect().head.getString(0)
    assert(line.split(",").length === 3)

    // replaying a committed batch id (restart recovery) is a no-op
    val replay = allChanges.take(50).toDF()
      .select(col("id"), col("blockNum").as("block_num"), col("op"), col("value"))
    assert(!BundledCsvSink.writeBatch(replay, 0L, out, 250))
    assert(spark.read.text(out).count() === allChanges.size)
    // a NEW batch id still writes
    assert(BundledCsvSink.writeBatch(replay, 999L, out, 250))
    assert(spark.read.text(out).count() === allChanges.size + 50)
    // crash-between-write-and-marker: simulate by deleting the marker
    // and replaying — the batch-prefixed files are swept, not doubled
    val markerPath = new org.apache.hadoop.fs.Path(out, "_committed/batch-999")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(markerPath, false)
    assert(BundledCsvSink.writeBatch(replay, 999L, out, 250))
    assert(spark.read.text(out).count() === allChanges.size + 50)
  }

  test("windowed stats finalize on watermark and drop late data") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    case class TsChange(ts: Timestamp, id: String, block_num: Long, op: String)
    val input = MemoryStream[(Long, String, Long, String)]
    val changes = input.toDS()
      .toDF("epoch", "id", "block_num", "op")
      .select(org.apache.spark.sql.functions.timestamp_seconds($"epoch").as("ts"),
        $"id", $"block_num", $"op")
    val q = graft.streaming.EntityStatsStream
      .windowedStats(changes, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L // window-aligned-ish base
      // batch 1: two windows of events
      input.addData(Seq(
        (t0 + 0L, "a", 1L, "CREATE"), (t0 + 60L, "b", 2L, "UPDATE"),
        (t0 + 120L, "a", 3L, "UPDATE")))
      q.processAllAvailable()
      // batch 2: jump far ahead -> watermark passes the first window
      input.addData(Seq((t0 + 3600L, "c", 10L, "CREATE")))
      q.processAllAvailable()
      // batch 3: a LATE event for the first window must be dropped
      input.addData(Seq((t0 + 30L, "z", 99L, "CREATE")))
      q.processAllAvailable()
      input.addData(Seq((t0 + 7200L, "d", 11L, "CREATE")))
      q.processAllAvailable()

      val rows = spark.table("win_stats").collect()
      assert(rows.nonEmpty)
      // the finalized first-window rows must not include the late id "z"
      val total = rows.map(_.getAs[Long]("n_changes")).sum
      assert(total <= 4, s"late event leaked into finalized windows: ${rows.mkString})")
      assert(rows.forall(_.getAs[Long]("last_block") != 99L))
    } finally q.stop()
  }

  test("session stream finalizes gap-separated sessions matching the batch grouping") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDS().toDF("epoch", "user_id", "value")
      .select(timestamp_seconds($"epoch").as("ts"), $"user_id", $"value")
    val q = graft.streaming.SessionStream.sessions(events, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("session_stream")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      // u1: two sessions (gap > 30 min); u2: one session
      input.addData(Seq(
        (t0, "u1", 1.25), (t0 + 600, "u1", 2.00),             // session A
        (t0 + 600 + 2400, "u2", 5.00),                        // session C
        (t0 + 600 + 1200, "u1", 0.75)))                       // still session A (gap 1200s < 30m)
      q.processAllAvailable()
      input.addData(Seq((t0 + 9000, "u1", 4.50)))             // session B (gap > 30m)
      q.processAllAvailable()
      // advance the watermark far past every session end
      input.addData(Seq((t0 + 100000, "zz", 0.0))); q.processAllAvailable()
      input.addData(Seq((t0 + 200000, "zz", 0.0))); q.processAllAvailable()

      val rows = spark.table("session_stream")
        .filter($"user_id" =!= "zz").collect()
        .map(r => (r.getAs[String]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value"))).toSet
      assert(rows === Set(("u1", 3L, 4.00), ("u1", 1L, 4.50), ("u2", 1L, 5.00)))
    } finally q.stop()
  }

  test("curation stream chains dedup into windowed stats and drops junk + dups") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, String)]
    val docs = input.toDS().toDF("epoch", "doc_id", "text", "lang")
      .select(timestamp_seconds($"epoch").as("ts"), $"doc_id", $"text", $"lang")
    val q = graft.streaming.CurationStream
      .curatedStats(docs, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L // window-aligned
      val good = "one two three four five six"
      input.addData(Seq(
        (t0 + 10, 1L, good, "en"),
        (t0 + 20, 2L, "too short", "en"),          // fails the token gate
        (t0 + 30, 3L, good, "en"),                 // duplicate of 1
        (t0 + 40, 4L, good + " seven", "fr"),
        // passes the token gate but every bigram repeats (dup share
        // 1000 > MaxDupBigramX1000) — the repetition gate drops it
        (t0 + 50, 5L, "spam ham spam ham spam ham spam ham", "en")))
      q.processAllAvailable()
      // watermark far past the first window -> stats finalize
      input.addData(Seq((t0 + 7200, 9L, good + " x y z", "de"))); q.processAllAvailable()
      input.addData(Seq((t0 + 14400, 10L, good + " p q r", "de"))); q.processAllAvailable()

      val rows = spark.table("curation_stream").collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens")))
      // first window: exactly one EN doc (dup + junk dropped), one FR doc
      assert(rows.contains(("en", 1L, 6L)), rows.mkString(", "))
      assert(rows.contains(("fr", 1L, 7L)), rows.mkString(", "))
      assert(!rows.exists { case (l, n, _) => l == "en" && n > 1 })
    } finally q.stop()
  }

  test("curated docs stream ships gated, deduped, PII-scrubbed documents") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, String)]
    val docs = input.toDS().toDF("epoch", "doc_id", "text", "lang")
      .select(timestamp_seconds($"epoch").as("ts"), $"doc_id", $"text", $"lang")
    val q = graft.streaming.CurationStream
      .curatedDocs(docs, "10 minutes")
      .writeStream.format("memory").queryName("curated_docs")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      val pii = "contact alice@example.com from 10.1.2.3 about the launch"
      input.addData(Seq(
        (t0 + 10, 1L, pii, "en"),
        (t0 + 20, 2L, "too short", "en"),     // token gate drops
        (t0 + 30, 3L, pii, "en"),             // dedup drops (same pre-scrub text)
        (t0 + 40, 4L, "one two three four five six", "fr")))
      q.processAllAvailable()
      val rows = spark.table("curated_docs").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
      assert(rows.keySet === Set(1L, 4L), rows.toString)
      // redaction applied on the way out, same semantics as the batch oracle
      assert(rows(1L) === "contact <EMAIL> from <IP> about the launch")
      assert(rows(4L) === "one two three four five six")
    } finally q.stop()
  }

  test("embed dedup stream drops reference near-dups, admits novel vectors") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(graft.queries.Dedup.Dims)(rnd.nextFloat() * 2 - 1)
    val base = vec()
    val ref = Seq((100L, base), (101L, vec()), (102L, vec()))
      .toDF("vec_id", "embedding")
    val refIndex = graft.streaming.EmbedDedupStream.referenceIndex(ref)

    val input = MemoryStream[(Long, Array[Float])]
    val stream = input.toDS().toDF("vec_id", "embedding")
    val q = graft.streaming.EmbedDedupStream
      .novelVectors(stream, refIndex, tau = 0.95)
      .writeStream.format("memory").queryName("novel_vectors")
      .outputMode("append").start()
    try {
      // id 1 ≈ reference 100 (cos ≈ 0.999) → dropped; 2 and 3 are
      // independent random vectors → admitted (random 64-dim cosine
      // concentrates near 0, far from the 0.95 cut)
      val near = base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f)
      input.addData(Seq((1L, near), (2L, vec()), (3L, vec())))
      q.processAllAvailable()
      // an exact copy of a reference vector in a second batch — the
      // gate is stateless, so the static side screens every batch
      input.addData(Seq((4L, base.clone()), (5L, vec())))
      q.processAllAvailable()
      val admitted = spark.table("novel_vectors").collect()
        .map(_.getAs[Long]("vec_id")).toSet
      assert(admitted === Set(2L, 3L, 5L), admitted.toString)
    } finally q.stop()

    // the gate must agree with the batch blocking+cosine semantics:
    // batch pair generation over (ref ∪ probes) finds a cross pair
    // exactly when the stream would have dropped the probe
    val probes = Seq((1L, base.map(x => x + 0.001f)), (2L, vec()))
      .toDF("vec_id", "embedding")
    val union = ref.union(probes)
    val batchPairs = graft.queries.Dedup.embedCosinePairs(union, 0.95)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(batchPairs.exists { case (a, b) => a == 1L && b >= 100L || b == 1L && a >= 100L })
  }

  test("phash near-dup alerting: banded stream-static collisions match the batch pair miner") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // 400 bytes → w=36, h=12: all 8 dHash grid rows distinct (BmpSpec
    // pins the single-band ≤2-bit property of the planted flip)
    val base = Array.tabulate(400)(i => ((i * 37 + 11) % 251).toByte)
    val far = base.reverse
    val ref = Seq(100L -> base, 101L -> far).toDF("doc_id", "payload")
    val refIndex = graft.streaming.PhashDedupStream.referenceIndex(ref)

    val input = MemoryStream[(Long, Array[Byte])]
    val stream = input.toDS().toDF("doc_id", "payload")
    val q = graft.streaming.PhashDedupStream
      .collisions(stream, refIndex, maxHamming = 3)
      .writeStream.format("memory").queryName("phash_alerts")
      .outputMode("append").start()
    try {
      // 1 = one flipped GRID-SAMPLED pixel vs ref 100 (position 116 =
      // grid (r=2, c=2): ≤2 differing bits, confined to band 1 → 3 of
      // 4 bands still collide); 2 = random-ish, far from both refs
      val near = base.clone(); near(116) = 250.toByte
      val novel = Array.tabulate(400)(i => ((i * 101 + 7) % 249).toByte)
      input.addData(Seq((1L, near), (2L, novel)))
      q.processAllAvailable()
      // stateless: an exact copy arriving in a LATER batch still
      // alerts (hamming 0, all four bands collide)
      input.addData(Seq((3L, base.clone())))
      q.processAllAvailable()
      val rows = spark.table("phash_alerts").collect()
      val pairs = rows.map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("ref_id"))).toSet
      assert(pairs === Set((1L, 100L), (3L, 100L)), rows.mkString(", "))
      // hamming is the pair's exact popcount on every per-band row
      rows.foreach { r =>
        val h = r.getAs[Int]("hamming")
        if (r.getAs[Long]("doc_id") == 3L) assert(h === 0)
        else assert(h >= 1 && h <= 3, r.toString)
      }
      // all four bands of the exact copy collide
      assert(rows.count(_.getAs[Long]("doc_id") == 3L) === 4)

      // parity with the batch miner: distinct cross pairs == the batch
      // key's pairs over (ref ∪ arrivals), restricted to cross edges
      val arrivals = Seq(1L -> near, 2L -> novel, 3L -> base.clone())
      val hashedUnion = (Seq(100L -> base, 101L -> far) ++ arrivals)
        .map { case (id, p) =>
          val h = graft.queries.Multimodal.phashOfPayload(p)
          (id, h(0), h(1), h(2), h(3))
        }.toDF("doc_id", "b0", "b1", "b2", "b3")
      val batchCross = graft.queries.Multimodal.phashPairs(hashedUnion, 3)
        .collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
        .filter { case (a, b) => (a >= 100L) != (b >= 100L) }
        .map { case (a, b) => if (a >= 100L) (b, a) else (a, b) }.toSet
      assert(pairs === batchCross)
    } finally q.stop()
  }

  test("streaming dedup keeps only the first occurrence of each text") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String)]
    val docs = input.toDS().toDF("epoch", "doc_id", "text")
      .select(org.apache.spark.sql.functions.timestamp_seconds($"epoch").as("ts"),
        $"doc_id", $"text")
    val q = graft.streaming.StreamingDedup.firstOccurrences(docs, "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L
      input.addData(Seq((t0, 1L, "alpha"), (t0 + 1, 2L, "beta"), (t0 + 2, 3L, "alpha")))
      q.processAllAvailable()
      input.addData(Seq((t0 + 3, 4L, "beta"), (t0 + 4, 5L, "gamma")))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").collect()
      val texts = rows.map(_.getAs[String]("text")).sorted
      assert(texts.sameElements(Seq("alpha", "beta", "gamma")))
      // the FIRST doc_id of each text won
      val byText = rows.map(r => (r.getAs[String]("text"), r.getAs[Long]("doc_id"))).toMap
      assert(byText("alpha") === 1L && byText("beta") === 2L && byText("gamma") === 5L)
    } finally q.stop()
  }

  test("streaming stablehash poi chain matches the sequential reference chain") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.operators.PoiStableHash
    import graft.streaming.PoiStableHashStream
    import graft.streaming.PoiStableHashStream.ChangeEvent
    def ts(bn: Long) = new java.sql.Timestamp(1700000000000L + bn * 1000)

    val rows = EntityChanges.changes(spark, sf)
      .select(col("block_num"), col("id"), col("op"),
        PoiStableHash.valueText(col("value")).as("v"))
      .orderBy("block_num").limit(300).collect()
      .map(r => (r.getAs[Long]("block_num"), r.getAs[String]("id"),
        r.getAs[String]("op"), r.getAs[String]("v")))
    val evs = rows.map { case (bn, id, op, v) => ChangeEvent(bn, id, op, v, ts(bn)) }

    val got = scala.collection.mutable.Map[Long, String]()
    val input = MemoryStream[ChangeEvent]
    val folder = new PoiStableHashStream.ChainFolder
    val q = PoiStableHashStream.start(
      input.toDS().withWatermark("ts", "15 seconds"), folder)(
      ps => ps.foreach { case (b, p) => got(b) = p })
    try {
      val (b1, b2) = evs.splitAt(150)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val maxBn = rows.map(_._1).max
      input.addData(Seq(ChangeEvent(maxBn + 1000, "x", "UPDATE", "1.00", ts(maxBn + 1000))))
      q.processAllAvailable()
      input.addData(Seq(ChangeEvent(maxBn + 2000, "x", "UPDATE", "1.00", ts(maxBn + 2000))))
      q.processAllAvailable()
    } finally q.stop()

    // reference-faithful sequential Pause(prev) chain over the same blocks
    val blocks = rows.groupBy(_._1).toSeq.map { case (bn, rs) =>
      bn -> rs.sortBy(r => (r._2, r._3)).map { case (_, id, op, v) =>
        if (op == "DELETE") PoiStableHash.RemoveEntity("user_state", id): PoiStableHash.PoiEvent
        else PoiStableHash.SetEntity("user_state", id, Seq(
          "last_op" -> PoiStableHash.EString(op),
          "value" -> PoiStableHash.EBigDecimal(v))): PoiStableHash.PoiEvent
      }.toSeq
    }
    val want = PoiStableHash.chainSequential(blocks).toMap
    want.foreach { case (bn, poi) =>
      assert(got.get(bn).contains(poi), s"block $bn diverges")
    }
    assert(want.nonEmpty && got.size >= want.size)

    // restart equivalence: a folder seeded with the cursor taken after
    // any prefix continues the chain bit-for-bit
    val locals = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (bn, rs) =>
      val evs = rs.sortBy(r => (r._2, r._3)).map { case (_, id, op, v) =>
        if (op == "DELETE") PoiStableHash.RemoveEntity("user_state", id): PoiStableHash.PoiEvent
        else PoiStableHash.SetEntity("user_state", id, Seq(
          "last_op" -> PoiStableHash.EString(op),
          "value" -> PoiStableHash.EBigDecimal(v))): PoiStableHash.PoiEvent
      }.toSeq
      val h = PoiStableHash.blockLocal(bn, evs)
      PoiStableHashStream.BlockLocal(bn, h.mixer.v0, h.mixer.v1, h.mixer.v2, h.count)
    }
    val (front, back) = locals.splitAt(locals.length / 2)
    val f1 = new PoiStableHashStream.ChainFolder()
    val prefix = f1.fold(front)
    val resumed = new PoiStableHashStream.ChainFolder(f1.cursor).fold(back)
    (prefix ++ resumed).foreach { case (bn, poi) =>
      assert(want(bn) === poi, s"resumed chain diverges at block $bn")
    }

    // at-least-once safety: a failed emit leaves the cursor untouched
    // (the retry recomputes identically), and a replayed committed
    // batch id is a no-op
    val f2 = new PoiStableHashStream.ChainFolder()
    var emitted = List.empty[Seq[(Long, String)]]
    intercept[RuntimeException] {
      f2.foldAndEmit(0L, front)(_ => throw new RuntimeException("sink down"))
    }
    f2.foldAndEmit(0L, front)(out => emitted ::= out) // retry succeeds
    f2.foldAndEmit(0L, front)(out => emitted ::= out) // replay no-ops
    f2.foldAndEmit(1L, back)(out => emitted ::= out)
    assert(emitted.length === 2)
    emitted.flatten.foreach { case (bn, poi) =>
      assert(want(bn) === poi, s"retried chain diverges at block $bn")
    }
    assert(f2.committedBatchId === 1L)
  }

  test("streaming poi digests match the batch blockDigest once blocks close") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.streaming.PoiStream
    import graft.streaming.PoiStream.BlockEvent
    // block = blockNum/10; every event carries its BLOCK's timestamp
    // (constant within the block — the blockDigests contract)
    val changes = EntityChanges.changes(spark, sf)
      .orderBy("block_num").limit(300).collect().map { r =>
      val bn = r.getAs[Long]("block_num")
      BlockEvent(bn / 10, bn,
        s"${r.getAs[String]("op")}:${r.getAs[String]("id")}:" +
          new java.math.BigDecimal(r.getAs[Double]("value")).setScale(2, java.math.RoundingMode.HALF_UP),
        new java.sql.Timestamp(1700000000000L + (bn / 10) * 10000))
    }.toSeq
    val input = MemoryStream[BlockEvent]
    val withWm = input.toDS().withWatermark("ts", "15 seconds").as[BlockEvent]
    val q = PoiStream.blockDigests(withWm)
      .writeStream.format("memory").queryName("poi_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = changes.splitAt(150)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // push the watermark far past everything to close all blocks
      input.addData(Seq(BlockEvent(9999L, 99990L, "x",
        new java.sql.Timestamp(1700000000000L + 10000L * 1000)))); q.processAllAvailable()
      input.addData(Seq(BlockEvent(10000L, 100000L, "x",
        new java.sql.Timestamp(1700000000000L + 20000L * 1000)))); q.processAllAvailable()

      val got = spark.table("poi_stream")
        .filter($"block" < 30).collect()
        .map(r => (r.getAs[Long]("block"), r.getAs[String]("digest"))).toMap
      val want = graft.queries.GraphLoad.glPoiBlockDigest(spark, sf)
        .filter($"block" < 30).collect()
        .map(r => (r.getAs[Long]("block"), r.getAs[String]("digest"))).toMap
      assert(got === want)
      assert(got.size === 30)
    } finally q.stop()
  }

  test("pack stream in doc_id-ordered batches reproduces the batch packer exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.PackStream.assignments(
        input.toDF().toDF("doc_id", "text"),
        graft.queries.TextAnalysis.PackShards, graft.queries.TextAnalysis.PackBudget)
      .writeStream.format("memory").queryName("pack_stream")
      .outputMode("append").start()
    try {
      val docs = Tables.documents(spark, sf)
        .select($"doc_id", $"text").as[(Long, String)]
        .collect().sortBy(_._1)
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }

      val got = spark.table("pack_stream").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("n_tok"),
            r.getAs[Long]("start_tok"), r.getAs[Long]("seq_in_shard")))).toMap
      val want = graft.queries.TextAnalysis.txPack(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("n_tok"),
            r.getAs[Long]("start_tok"), r.getAs[Long]("seq_in_shard")))).toMap
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("pack stream cursors persist across batches and cross sequence boundaries") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    // one shard (ids all ≡ 0 mod 8), budget 6: doc 0 (4 toks) then doc 8
    // (4 toks) in ANOTHER batch must continue at offset 4 — sequence 0
    // for its first token even though it spills past the budget — and
    // doc 16 (2 toks) starts exactly at 8 in sequence 1
    val q = graft.streaming.PackStream.assignments(
        input.toDF().toDF("doc_id", "text"), 8, 6L)
      .writeStream.format("memory").queryName("pack_stream_edge")
      .outputMode("append").start()
    try {
      input.addData(Seq((0L, "a b c d"))); q.processAllAvailable()
      input.addData(Seq((8L, "e f g h"), (16L, "i j"))); q.processAllAvailable()
      val got = spark.table("pack_stream_edge").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("start_tok"), r.getAs[Long]("seq_in_shard")))).toMap
      assert(got === Map(0L -> ((0L, 0L)), 8L -> ((4L, 0L)), 16L -> ((8L, 1L))))
    } finally q.stop()
  }

  test("ann stream: streamed queries reproduce the batch LSH top-k exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val refIndex = graft.streaming.AnnStream
      .referenceIndex(Tables.embeddings(spark, sf))
      .persist()
    val input = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.AnnStream.topkContinuous(
        input.toDF().toDF("vec_id", "embedding"), refIndex)
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode("append").start()
    try {
      // the batch operator's query set (vec_id < NumQueries), split
      // across two micro-batches — answers must be identical rows
      val queries = Tables.embeddings(spark, sf)
        .filter($"vec_id" < graft.queries.Ann.NumQueries)
        .select($"vec_id", $"embedding").as[(Long, Array[Float])]
        .collect().sortBy(_._1)
      val (b1, b2) = queries.splitAt(queries.length / 2)
      Seq(b1, b2).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val got = spark.table("ann_stream").collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
          r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSet
      val want = graft.queries.Ann.annLshBucket(spark, sf).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
          r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally { q.stop(); refIndex.unpersist() }
  }

  test("bm25 stream: streamed queries reproduce the batch top-k exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val index = graft.queries.TextAnalysis.bm25ScoringIndex(spark, sf)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Bm25Stream.topkContinuous(
        input.toDF().toDF("query_id", "t"), index)
      .writeStream.format("memory").queryName("bm25_stream")
      .outputMode("append").start()
    try {
      // the batch key's literal query set, split across two
      // micro-batches on the query boundary — answers must be the
      // batch key's exact rows (incl. NO rows for the absent-term-only
      // query)
      val (b1, b2) = graft.queries.TextAnalysis.Bm25Queries.partition(_._1 <= 2L)
      Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.table("bm25_stream").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSet
      val want = graft.queries.TextAnalysis.txBm25(spark, sf).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("bm25 stream: null query rows are dropped, not an encoder crash") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val index = graft.queries.TextAnalysis.bm25ScoringIndex(spark, sf)
    val input = MemoryStream[(java.lang.Long, String)]
    val q = graft.streaming.Bm25Stream.topkContinuous(
        input.toDF().toDF("query_id", "t"), index)
      .writeStream.format("memory").queryName("bm25_stream_nulls")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (java.lang.Long.valueOf(1L), "spark"),
        (java.lang.Long.valueOf(2L), null),
        (null.asInstanceOf[java.lang.Long], "spark")))
      q.processAllAvailable()
      val got = spark.table("bm25_stream_nulls").collect()
      // only query 1 survives the guard; it still answers fully
      assert(got.nonEmpty)
      assert(got.map(_.getAs[Long]("query_id")).toSet === Set(1L))
    } finally q.stop()
  }

  test("bm25 stream: a query re-arriving in a later micro-batch is dropped and counted") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val index = graft.queries.TextAnalysis.bm25ScoringIndex(spark, sf)
    val late = spark.sparkContext.longAccumulator("bm25_late_fragments")
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Bm25Stream.topkContinuous(
        input.toDF().toDF("query_id", "t"), index, lateFragments = Some(late))
      .writeStream.format("memory").queryName("bm25_stream_late")
      .outputMode("append").start()
    try {
      val batch1 = graft.queries.TextAnalysis.Bm25Queries.filter(_._1 == 1L)
      input.addData(batch1); q.processAllAvailable()
      val answered = spark.table("bm25_stream_late").collect()
      assert(answered.nonEmpty)
      // the SAME query's terms arrive again in a later micro-batch:
      // the arrival contract is violated — no second overlapping
      // top-k (no duplicate rk per query_id), and the violation is
      // observable on the accumulator
      input.addData(batch1); q.processAllAvailable()
      val after = spark.table("bm25_stream_late").collect()
      assert(after.length === answered.length)
      val dupRk = after.groupBy(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk")))
        .values.count(_.length > 1)
      assert(dupRk === 0)
      assert(late.value > 0L, "late-fragment accumulator never incremented")
    } finally q.stop()
  }

  test("pack stream: all-docs-one-shard batch packs correctly; null rows are dropped") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.lang.Long, String)]
    val q = graft.streaming.PackStream.assignments(
        input.toDF().toDF("doc_id", "text"), 8, 5L)
      .writeStream.format("memory").queryName("pack_stream_hot")
      .outputMode("append").start()
    try {
      // pathological batch: EVERY doc lands on shard 0 (ids ≡ 0 mod 8)
      // — the per-group buffer holds the whole micro-batch; plus a
      // null-text and a null-id row, which the input guard must drop
      // instead of failing the tuple encoder mid-batch
      val hot = (0L until 40L).map(i => (java.lang.Long.valueOf(i * 8), ("t " * (1 + (i % 3).toInt)).trim))
      input.addData(hot ++ Seq((java.lang.Long.valueOf(999L), null), (null.asInstanceOf[java.lang.Long], "orphan")))
      q.processAllAvailable()
      val got = spark.table("pack_stream_hot").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
          r.getAs[Long]("n_tok"), r.getAs[Long]("start_tok")))
      assert(got.length === hot.length) // null rows dropped, no failure
      assert(got.forall(_._2 === 0L))
      // gapless in doc_id order with cursors from 0
      var c = 0L
      got.sortBy(_._1).foreach { r => assert(r._4 === c); c += r._3 }
    } finally q.stop()
  }

  test("pack stream on shuffled arrivals keeps per-shard cursors gapless and batch-ordered") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.PackStream.assignments(
        input.toDF().toDF("doc_id", "text"), 4, 10L)
      .writeStream.format("memory").queryName("pack_stream_rand")
      .outputMode("append").start()
    try {
      // deterministic pseudo-shuffle: docs arrive in NON-doc_id order
      val docs = (0L until 60L).map(i => (i * 37 % 61, "w " * (1 + (i % 5).toInt)))
        .map { case (id, t) => (id, t.trim) }
      val batches = docs.grouped(17).toSeq
      batches.foreach { b => input.addData(b); q.processAllAvailable() }

      val got = spark.table("pack_stream_rand").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
          r.getAs[Long]("n_tok"), r.getAs[Long]("start_tok"),
          r.getAs[Long]("seq_in_shard")))
      assert(got.length === docs.length)
      // sequential reference: fold the same batches, doc_id-sorted
      // within each batch per shard, cursors carried across batches
      val cursor = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      val want = batches.flatMap { b =>
        b.groupBy(_._1 % 4).toSeq.flatMap { case (shard, members) =>
          members.sortBy(_._1).map { case (id, t) =>
            val n = t.split(" ", -1).length.toLong
            val start = cursor(shard); cursor(shard) = start + n
            (id, shard, n, start, start / 10L)
          }
        }
      }.toSet
      assert(got.toSet === want)
      // gapless: per shard, offsets sorted == running prefix sums
      got.groupBy(_._2).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._4)
        var c = 0L
        sorted.foreach { r => assert(r._4 === c); c += r._3 }
      }
    } finally q.stop()
  }

  test("hll stream: batch-split fold equals the batch sketch exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // (event_type, user_id, ts): three types, overlapping users/days,
    // duplicates across batches (must not move any register)
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")
    val all = (0 until 300).map { i =>
      (Seq("click", "view", "buy")(i % 3), (i % 37).toLong, ts(1 + i % 25, i % 24))
    }
    val input = MemoryStream[(String, Long, java.sql.Timestamp)]
    val q = graft.streaming.HllStream.sketchContinuous(
        input.toDF().toDF("event_type", "user_id", "ts"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    try {
      // uneven batches + a full replay of batch 1 (idempotent on a max)
      input.addData(all.take(100)); q.processAllAvailable()
      input.addData(all.slice(100, 250)); q.processAllAvailable()
      input.addData(all.drop(250) ++ all.take(100)); q.processAllAvailable()
      val streamed = spark.table("hll_stream").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_folds"),
          r.getAs[Long]("zero_regs"), r.getAs[Double]("hll_est")))
        .groupBy(_._1).map { case (et, rows) => et -> rows.maxBy(_._2) }
      val batch = graft.queries.Analytics.hllSketch(
          all.toDF("event_type", "user_id", "ts")).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("zero_regs"), r.getAs[Double]("hll_est")))).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (et, (_, folds @ _, zeros, est)) =>
        assert((zeros, est) === batch(et), s"type $et")
      }
      // every key saw all three folds
      assert(streamed.values.forall(_._2 === 3L))
    } finally q.stop()
  }

  test("cms stream: batch-split fold equals the batch registers exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // shingle-rich docs with heavy cross-doc overlap; each doc arrives
    // exactly once (the documented disjointness contract — sums are
    // not idempotent)
    val words = Seq("the", "quick", "brown", "fox", "jumps", "over", "a", "lazy", "dog")
    val all = (0 until 120).map { i =>
      (i.toLong, (0 until 12).map(k => words((i + k * k) % words.length)).mkString(" "))
    }
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.CmsStream.sketchContinuous(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").start()
    try {
      input.addData(all.take(40)); q.processAllAvailable()
      input.addData(all.slice(40, 110)); q.processAllAvailable()
      input.addData(all.drop(110)); q.processAllAvailable()
      val streamed = spark.table("cms_stream").collect()
        .map(r => (r.getAs[Int]("i"), r.getAs[Long]("n_folds"), r.getAs[Seq[Long]]("regs")))
        .groupBy(_._1).map { case (i, rows) => i -> rows.maxBy(_._2) }
      assert(streamed.keySet === (0 until graft.queries.TextAnalysis.CmsDepth).toSet)
      assert(streamed.values.forall(_._2 === 3L))
      // sparse batch registers == dense streamed arrays, cell by cell
      val batch = graft.queries.TextAnalysis.cmsRegisters(
          graft.queries.TextAnalysis.cmsVocab(all.toDF("doc_id", "text")))
        .collect()
        .map(r => (r.getAs[Int]("i"), r.getAs[Long]("bucket")) -> r.getAs[Long]("reg"))
        .toMap
      for (i <- 0 until graft.queries.TextAnalysis.CmsDepth;
           b <- 0 until graft.queries.TextAnalysis.CmsWidth.toInt) {
        val want = batch.getOrElse((i, b.toLong), 0L)
        assert(streamed(i)._3(b) === want, s"row $i bucket $b")
      }
    } finally q.stop()
  }

  test("funnel stream: ordered fold equals the batch funnel, incl. the traps") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val h = 3600L * 1000000L
    val day = 24 * h
    // the batch spec's scenario: u1 converts, u2's click precedes its
    // view, u3 purchases outside the horizon, u4 never views
    val all = Seq(
      (1L, "view", 0L), (1L, "click", h), (1L, "purchase", 2 * h),
      (2L, "click", 0L), (2L, "view", h), (2L, "purchase", 2 * h),
      (3L, "view", 0L), (3L, "click", h), (3L, "purchase", 8 * day),
      (4L, "click", 0L), (4L, "purchase", h)
    ).sortBy(_._3) // event-time ordered feed — the documented contract
    val input = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.FunnelStream.steps(
        input.toDF().toDF("user_id", "event_type", "tus")
          .select($"user_id", $"event_type", timestamp_micros($"tus").as("ts")))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      input.addData(all.take(4)); q.processAllAvailable()
      input.addData(all.slice(4, 9)); q.processAllAvailable()
      input.addData(all.drop(9)); q.processAllAvailable()
      // latest state per user (the memory sink appends updates; the
      // final batch's row per user is the standing state)
      val steps = spark.table("funnel_stream")
        .groupBy($"user_id").agg(max_by($"step", $"n_folds").as("step"))
        .collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("step")).toMap
      assert(steps === Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
      // aggregate conversion counts equal the batch funnel exactly
      val batch = graft.queries.Analytics.windowFunnel(
          all.toDF("user_id", "event_type", "tus")
            .select($"user_id", $"event_type", timestamp_micros($"tus").as("ts")))
        .collect().map(r => r.getAs[Long]("step") -> r.getAs[Long]("users")).toMap
      val fromStream = Map(
        1L -> steps.values.count(_ >= 1).toLong,
        2L -> steps.values.count(_ >= 2).toLong,
        3L -> steps.values.count(_ >= 3).toLong)
      assert(fromStream === batch)
    } finally q.stop()
  }

  test("quantile stream: batch-split fold equals the batch sketch exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // three types, values spread over many bins incl. the clamp bin
    // and nulls (excluded by the shared projection); each event
    // arrives once (sums are not idempotent — documented contract)
    val all: Seq[(String, java.lang.Double)] = (0 until 400).map { i =>
      val v: java.lang.Double =
        if (i % 19 == 0) null
        else if (i % 31 == 0) 5000.0 // clamps into bin 1023
        else (i * 7 % 997) + (i % 10) / 10.0
      (Seq("click", "view", "buy")(i % 3), v)
    }
    val input = MemoryStream[(String, java.lang.Double)]
    val q = graft.streaming.QuantileStream.sketchContinuous(
        input.toDF().toDF("event_type", "value"))
      .writeStream.format("memory").queryName("quantile_stream")
      .outputMode("update").start()
    try {
      input.addData(all.take(120)); q.processAllAvailable()
      input.addData(all.slice(120, 330)); q.processAllAvailable()
      input.addData(all.drop(330)); q.processAllAvailable()
      val streamed = spark.table("quantile_stream").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_folds"),
          (r.getAs[Long]("n"), r.getAs[Long]("p50_lb"),
           r.getAs[Long]("p90_lb"), r.getAs[Long]("p99_lb"))))
        .groupBy(_._1).map { case (et, rows) => et -> rows.maxBy(_._2) }
      val batch = graft.queries.Analytics.quantileHist(
          all.toDF("event_type", "value")).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("p50_lb"),
            r.getAs[Long]("p90_lb"), r.getAs[Long]("p99_lb")))).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (et, (_, folds, qs)) =>
        assert(qs === batch(et), s"type $et")
        assert(folds === 3L)
      }
    } finally q.stop()
  }

  test("retention stream: shuffled out-of-order fold equals the batch grid") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val wk = graft.queries.Analytics.WeekUs
    // three users, activity spread over weeks 0..9 with dups; delivery
    // order is deliberately scrambled ACROSS batches — the fold is
    // order-independent (min-fold + bitmask rebase), unlike the funnel
    val activity = Seq(
      (1L, 3L), (1L, 5L), (1L, 0L), (1L, 5L), (1L, 9L),
      (2L, 7L), (2L, 2L), (2L, 2L),
      (3L, 4L)
    )
    val scrambled = Seq(
      (1L, 5L), (2L, 7L), (1L, 9L), (3L, 4L), (1L, 3L),
      (2L, 2L), (1L, 0L), (2L, 2L), (1L, 5L)
    )
    assert(scrambled.sorted === activity.sorted)
    val input = MemoryStream[(Long, Long)]
    val q = graft.streaming.RetentionStream.weeks(
        input.toDF().toDF("user_id", "wus")
          .select($"user_id", timestamp_micros($"wus" * wk + 1000L).as("ts")))
      .writeStream.format("memory").queryName("retention_stream")
      .outputMode("update").start()
    try {
      input.addData(scrambled.take(3)); q.processAllAvailable()
      input.addData(scrambled.slice(3, 7)); q.processAllAvailable()
      input.addData(scrambled.drop(7)); q.processAllAvailable()
      val latest = spark.table("retention_stream")
        .groupBy($"user_id")
        .agg(max_by(struct($"cohort_week", $"mask"), $"n_folds").as("s"))
        .select($"user_id", $"s.cohort_week", $"s.mask")
      // state is exact: user 1 cohort 0, weeks {0,3,5,9}
      val m = latest.collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("cohort_week"), r.getAs[Long]("mask"))).toMap
      assert(m(1L) === (0L, (1L << 0) | (1L << 3) | (1L << 5) | (1L << 9)))
      assert(m(2L) === (2L, (1L << 0) | (1L << 5)))
      assert(m(3L) === (4L, 1L))
      // grid over latest state == batch retention of the same events
      val batchGrid = graft.queries.Analytics.retention(
          activity.toDF("user_id", "wus")
            .select($"user_id", timestamp_micros($"wus" * wk + 1000L).as("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val streamGrid = graft.streaming.RetentionStream.grid(latest)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamGrid === batchGrid)
    } finally q.stop()
  }

}
