package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{BundledCsvSink, CursorStore}
import graft.streaming.CursorStore.Cursor

/** Cursor persistence + resume parity for the sink loop (SURVEY.md §2
  * #43c): the reference persists its position (last_block.txt,
  * sinker/sinker.go:167-180, plus the sink library's per-block
  * cursor) and a restarted `run` resumes from it — re-delivering
  * nothing, losing nothing. */
class CursorSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  test("cursor artifact: byte-stable round-trip, reference last_block layout, atomic overwrite") {
    val dir = new Path(java.nio.file.Files.createTempDirectory("graft_cursor").toString)
    val c1 = Cursor(417L, "0xabc123", "opaque-cursor-417")
    CursorStore.write(conf, dir, c1)
    assert(CursorStore.read(conf, dir) === Some(c1))
    // line 1 IS the reference's "%d:%s\n" last_block.txt layout
    val bytes1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.toString, CursorStore.FileName))
    assert(new String(bytes1, "UTF-8").linesIterator.next() === "417:0xabc123")
    // byte-stable: the idempotent rewrite a replay performs leaves the
    // file bit-for-bit identical
    CursorStore.write(conf, dir, c1)
    val bytes2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir.toString, CursorStore.FileName))
    assert(bytes1.toSeq === bytes2.toSeq)
    // overwrite advances; no temp debris is left visible to readers
    val c2 = Cursor(1009L, "0xdef", "opaque-cursor-1009")
    CursorStore.write(conf, dir, c2)
    assert(CursorStore.read(conf, dir) === Some(c2))
    // a torn file (crash mid-write would leave the PREVIOUS file, but
    // a corrupted artifact must fail loudly, not parse to garbage)
    intercept[IllegalArgumentException](
      CursorStore.parse("417".getBytes("UTF-8")))
  }

  test("killed-and-resumed sink re-delivers nothing and loses nothing") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_cursor_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cursor_ckpt").toString
    val cursorDir = new Path(out, "_cursor")
    val BundleSize = 10L

    val input = MemoryStream[(String, Long, Double)]
    def startSink() = input.toDF().toDF("id", "block_num", "value")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // the run-loop order: commit the bundle data FIRST, then
        // advance the cursor — a crash between the two replays the
        // batch, and writeBatch's committed marker dedupes it
        val fresh = BundledCsvSink.writeBatch(b, id, out, BundleSize)
        if (fresh) {
          val mx = b.agg(max(col("block_num"))).collect().head
          if (!mx.isNullAt(0)) {
            val bn = mx.getLong(0)
            CursorStore.write(conf, cursorDir, Cursor(bn, s"0xhash$bn", s"c-$bn"))
          }
        }
      }
      .option("checkpointLocation", ckpt)
      .start()

    val blocks = (1L to 40L).map(b => (s"e${b % 7}", b, b * 1.5))
    val (wave1, wave2) = blocks.splitAt(25)

    // run, then KILL after the first wave commits
    val q1 = startSink()
    try { input.addData(wave1); q1.processAllAvailable() } finally q1.stop()
    val afterKill = CursorStore.read(conf, cursorDir)
    assert(afterKill.map(_.blockNum) === Some(25L))

    // resume from the same checkpoint: the source replays nothing that
    // committed; the remaining blocks flow through
    val q2 = startSink()
    try { input.addData(wave2); q2.processAllAvailable() } finally q2.stop()
    assert(CursorStore.read(conf, cursorDir).map(_.blockNum) === Some(40L))

    // exactly-once store: every block's line exactly once
    def storeLines() = spark.read.textFile(s"$out/bundle=*").collect().toSeq
    val lines = storeLines()
    val wantLines = BundledCsvSink.toCsvLines(
      blocks.toDF("id", "block_num", "value"), BundleSize)
      .select("line").collect().map(_.getString(0)).toSeq
    assert(lines.sorted === wantLines.sorted)

    // at-least-once REPLAY of an already-committed batch (the crash
    // window between data commit and checkpoint commit): the marker
    // dedupes the data, and the idempotent cursor rewrite is
    // byte-stable
    val cursorBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cursorDir.toString, CursorStore.FileName))
    val replayed = BundledCsvSink.writeBatch(
      wave2.toDF("id", "block_num", "value"), 1L, out, BundleSize)
    assert(!replayed, "committed batch must be a no-op on replay")
    CursorStore.write(conf, cursorDir, Cursor(40L, "0xhash40", "c-40"))
    val cursorBytes2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(cursorDir.toString, CursorStore.FileName))
    assert(storeLines().sorted === wantLines.sorted)
    assert(cursorBytes.toSeq === cursorBytes2.toSeq)
  }
}
