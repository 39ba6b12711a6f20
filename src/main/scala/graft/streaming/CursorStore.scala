package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}

/** Sink-progress cursor (SURVEY.md §2 #43c): the resumable position
  * the reference's run loop persists so a killed sink restarts WHERE
  * IT STOPPED instead of re-streaming from block 0. The reference
  * writes `last_block.txt` as `"<num>:<hash>\n"` when the stop block
  * is reached (reference sinker/sinker.go:167-180), and the substreams
  * sink library checkpoints the opaque connection cursor alongside on
  * every block — both are modeled here as ONE two-line artifact:
  *
  * {{{
  *   <block_num>:<block_hash>\n     // line 1 == last_block.txt layout
  *   <opaque cursor string>\n
  * }}}
  *
  * Contracts (spec-gated in CursorSpec):
  *   - BYTE-STABLE: equal states serialize to identical bytes, so the
  *     idempotent rewrite an at-least-once replay performs leaves the
  *     file bit-for-bit untouched;
  *   - ATOMIC: write-to-temp + rename-with-overwrite — a reader never
  *     observes a torn cursor, and a crash mid-write leaves the
  *     PREVIOUS cursor in place (the replay then redelivers from the
  *     old position, which the committed-marker sink layer dedupes —
  *     [[BundledCsvSink.writeBatch]]'s batch-id protocol);
  *   - RESUME: `read` at startup gives the exclusive lower bound the
  *     replay source restarts from (`blockNum` is the last block whose
  *     data is durably committed).
  */
object CursorStore {

  case class Cursor(blockNum: Long, blockHash: String, cursor: String)

  val FileName = "cursor.txt"

  /** Canonical byte layout — line 1 is the reference's last_block.txt
    * format verbatim, line 2 the opaque cursor. */
  def format(c: Cursor): Array[Byte] = {
    require(!c.blockHash.contains("\n") && !c.cursor.contains("\n"),
      "cursor fields must be single-line")
    s"${c.blockNum}:${c.blockHash}\n${c.cursor}\n"
      .getBytes(StandardCharsets.UTF_8)
  }

  def parse(bytes: Array[Byte]): Cursor = {
    val lines = new String(bytes, StandardCharsets.UTF_8).split("\n", -1)
    require(lines.length >= 3 && lines(2).isEmpty,
      s"torn cursor file (${bytes.length} bytes)")
    val i = lines(0).indexOf(':')
    require(i > 0, s"malformed last-block line: ${lines(0)}")
    Cursor(lines(0).substring(0, i).toLong, lines(0).substring(i + 1), lines(1))
  }

  /** Atomic overwrite: temp file + FileContext rename(OVERWRITE) — the
    * posix-rename contract local FS and HDFS both honor. */
  def write(conf: Configuration, dir: Path, c: Cursor): Unit = {
    val fc = FileContext.getFileContext(dir.toUri, conf)
    fc.mkdir(dir, FileContext.DEFAULT_PERM, true)
    val tmp = new Path(dir, s".$FileName.tmp")
    val dst = new Path(dir, FileName)
    val out = fc.create(tmp,
      EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE))
    try out.write(format(c)) finally out.close()
    fc.rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  def read(conf: Configuration, dir: Path): Option[Cursor] = {
    val fc = FileContext.getFileContext(dir.toUri, conf)
    val dst = new Path(dir, FileName)
    if (!fc.util.exists(dst)) None
    else {
      val len = fc.getFileStatus(dst).getLen.toInt
      val in = fc.open(dst)
      try {
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        Some(parse(buf))
      } finally in.close()
    }
  }
}
