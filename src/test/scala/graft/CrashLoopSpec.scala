package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{BundledCsvSink, CursorStore}
import graft.streaming.CursorStore.Cursor

/** Crash-loop soak for the resume path (reference sinker/sinker.go:
  * 100-180 — production sinks die and restart WEEKLY; CursorSpec
  * proves ONE kill/resume cycle, this drives ≥20 randomized ones):
  * the proto-replay run loop (data commit → cursor advance) is killed
  * at seeded-random points — before the data commit (mid-stage), in
  * the window between data commit and cursor write, mid-cursor-write
  * (torn temp file, crash before the rename), and mid-move (committed
  * marker torn off with a random subset of the batch's moved files —
  * the crash state writeBatch's replay sweep exists for) — and after
  * EVERY cycle the invariants must hold: cursor monotone, committed
  * store duplicate-free and a subset of the exactly-once expectation.
  * At the end: cursor at the head block, store exactly-once equal,
  * and the POI chain over the read-back equal to the chain over the
  * original feed. */
class CrashLoopSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("crash-loop soak: 25 randomized kill/resume cycles — cursor monotone, store exactly-once, POI chain intact") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val rng = new scala.util.Random(0x5DEECE66DL)
    val out = java.nio.file.Files.createTempDirectory("graft_crash_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_crash_ckpt").toString
    val cursorDir = new Path(out, "_cursor")
    val BundleSize = 16L

    // the feed: one change per block, 200 blocks, 25 waves of 8
    val blocks = (1L to 200L).map(b => (s"e${b % 7}", b, (b * 37 % 97) * 0.5))
    val expectedLines = BundledCsvSink.toCsvLines(
        blocks.toDF("id", "block_num", "value"), BundleSize)
      .select("line").collect().map(_.getString(0)).toSeq.sorted

    // 0 = clean; 1 = kill before data commit; 2 = kill between data
    // commit and cursor write; 3 = kill mid-cursor-write (torn temp,
    // no rename); 4 = kill mid-move (marker + random file subset torn)
    @volatile var crashMode = 0
    def plannedCrash(what: String) =
      throw new RuntimeException(s"planned-crash:$what")

    val input = MemoryStream[(String, Long, Double)]
    def startSink() = input.toDF().toDF("id", "block_num", "value")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (crashMode == 1) plannedCrash("mid-stage")
        BundledCsvSink.writeBatch(b, id, out, BundleSize): Unit
        crashMode match {
          case 2 => plannedCrash("pre-cursor")
          case 3 =>
            // torn cursor temp: crash after writing PARTIAL temp bytes,
            // before the rename — the visible cursor must survive
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(
              cursorDir.toUri, conf)
            fc.mkdir(cursorDir, org.apache.hadoop.fs.FileContext.DEFAULT_PERM, true)
            val tmp = new Path(cursorDir, s".${CursorStore.FileName}.tmp")
            val os = fc.create(tmp, java.util.EnumSet.of(
              org.apache.hadoop.fs.CreateFlag.CREATE,
              org.apache.hadoop.fs.CreateFlag.OVERWRITE))
            try os.write("99999:0xtorn".getBytes("UTF-8")) finally os.close()
            plannedCrash("mid-cursor-write")
          case 4 =>
            // tear the commit back open: drop the marker and a random
            // subset of the batch's moved files — exactly the state a
            // crash mid-move leaves (debris keyed by batch id, no
            // marker); the replay sweep must rebuild it exactly-once
            val fs = new Path(out).getFileSystem(conf)
            val marker = new Path(out, s"_committed/batch-$id")
            if (fs.exists(marker)) {
              fs.delete(marker, false): Unit
              val moved = fs.listStatus(new Path(out)).toSeq
                .filter(s => s.isDirectory && s.getPath.getName.startsWith("bundle="))
                .flatMap(d => fs.listStatus(d.getPath).toSeq)
                .filter(_.getPath.getName.startsWith(s"batch-$id-"))
              moved.filter(_ => rng.nextBoolean())
                .foreach(f => fs.delete(f.getPath, false))
            }
            plannedCrash("mid-move")
          case _ => ()
        }
        // data durably committed (fresh or replayed) → advance the
        // cursor, clamped monotone: a replayed old batch never moves
        // it backwards
        val mx = b.agg(max(col("block_num"))).collect().head
        if (!mx.isNullAt(0)) {
          val bn = mx.getLong(0)
          val cur = CursorStore.read(conf, cursorDir).map(_.blockNum).getOrElse(-1L)
          if (bn > cur)
            CursorStore.write(conf, cursorDir, Cursor(bn, f"0x$bn%08x", s"c-$bn"))
        }
      }
      .option("checkpointLocation", ckpt)
      .start()

    def committed(): Seq[String] =
      BundledCsvSink.committedLines(spark, out)
        .select("line").collect().map(_.getString(0)).toSeq

    var lastCursor = -1L
    var kills = 0
    var q = startSink()
    try {
      (0 until 25).foreach { cycle =>
        input.addData(blocks.slice(cycle * 8, cycle * 8 + 8))
        crashMode = if (rng.nextDouble() < 0.88) 1 + rng.nextInt(4) else 0
        val crashed =
          try { q.processAllAvailable(); false }
          catch { case _: Throwable => true }
        q.stop()
        crashMode = 0
        if (crashed) kills += 1
        // invariant 1: cursor monotone across every kill/resume, and
        // never torn (read succeeds or is absent)
        val cur = CursorStore.read(conf, cursorDir).map(_.blockNum).getOrElse(-1L)
        assert(cur >= lastCursor, s"cursor went backwards in cycle $cycle")
        lastCursor = cur
        // invariant 2: the committed store is duplicate-free and only
        // ever a subset of the exactly-once expectation
        val lines = committed()
        assert(lines.distinct.size === lines.size, s"duplicate lines, cycle $cycle")
        assert(lines.toSet.subsetOf(expectedLines.toSet), s"alien lines, cycle $cycle")
        q = startSink() // resume from the same checkpoint
      }
      // final clean drain
      q.processAllAvailable()
    } finally q.stop()

    assert(kills >= 20, s"soak exercised only $kills kill cycles")
    // cursor landed on the head block
    assert(CursorStore.read(conf, cursorDir).map(_.blockNum) === Some(200L))
    // store is exactly-once equal
    assert(committed().sorted === expectedLines)
    // POI chain over the read-back == the chain over the original feed
    val parsed = BundledCsvSink.committedLines(spark, out)
      .select(split(col("line"), ",").as("f"))
      .select(col("f").getItem(0).as("id"),
        col("f").getItem(1).cast("long").as("block_num"),
        col("f").getItem(2).cast("decimal(20,2)").cast("double").as("value"))
      .withColumn("op", lit("CREATE"))
    val direct = blocks.toDF("id", "block_num", "value")
      .withColumn("op", lit("CREATE"))
    def chain(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Poi.poiChain(df, blockSize = 10L, blocksPerBundle = 2L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val gotChain = chain(parsed)
    assert(gotChain === chain(direct))
    // blocks 1..200 at blockSize 10 span block groups 0..20 → 11 bundles
    assert(gotChain.size === 11)
  }
}
