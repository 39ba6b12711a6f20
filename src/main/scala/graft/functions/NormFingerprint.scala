package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused document fingerprint in ONE byte pass: the md5 hex digest of
  * `trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''),
  * ' +', ' '))` — TextAnalysis #37's normalize-then-digest chain
  * collapsed into a single expression. Registered as
  * `graft_fingerprint` ([[graft.plans.GraftExtensions]]).
  *
  * Why a native expression: the composable form is a unicode lowercase
  * materialization plus TWO full `java.util.regex` traversals (each
  * building an intermediate String) before md5 ever sees a byte — for
  * a map-only operator whose plan shape is already optimal, the
  * per-row constant factor IS the cost (tx_fingerprint was the largest
  * absolute weak key at sf1: 1.90 s vs DuckDB 0.512). This kernel
  * walks the UTF-8 bytes once, folding all four steps:
  *
  *   - ASCII letters lowercase by +32; `[a-z0-9]` survivors append;
  *   - runs of spaces collapse via a pending-space flag that only
  *     emits BETWEEN survivors — which is also exactly `trim` (no
  *     leading emit, trailing pending drops on the floor);
  *   - every other ASCII byte is stripped;
  *   - a non-ASCII sequence strips UNLESS its codepoint lowercases
  *     into `[a-z0-9]` — the two real cases are U+212A KELVIN SIGN →
  *     'k' and U+0130 İ → 'i'. Per-codepoint `Character.toLowerCase`
  *     agrees post-strip with both twins here: Spark's full-string
  *     lowercase maps İ → i + U+0307 and the combining dot is then
  *     stripped; DuckDB's utf8proc uses the simple map İ → i
  *     directly. Everything else (accents, fullwidth forms, CJK,
  *     emoji) lowercases to non-ASCII and is stripped by all three.
  *
  * The digest runs over the normalized bytes in place — no
  * intermediate String or UTF8String is ever built. Parity with the
  * composable chain is spec-pinned (kernel-twin contract,
  * FingerprintKernelSpec) on real documents plus adversarial
  * constructed inputs.
  */
case class NormFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_fingerprint expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormFingerprint =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint"
}

object NormFingerprint {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".getBytes

  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    // normalized output can only shrink: ASCII survivors are 1:1, the
    // two multibyte → ASCII cases shrink 2-3 bytes to 1
    val out = new Array[Byte](n)
    // `emit` is inlined at each site (a local def capturing the two
    // mutable locals would box them into runtime Refs on every call —
    // measurable in a per-row loop): emit(b) =
    //   if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
    //   out(o) = b; o += 1
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        if (b >= 'a' && b <= 'z' || b >= '0' && b <= '9') {
          if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
          out(o) = b; o += 1
        } else if (b >= 'A' && b <= 'Z') {
          if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
          out(o) = (b + 32).toByte; o += 1
        } else if (b == ' ' && o > 0) pendingSpace = true
        i += 1
      } else {
        // decode the UTF-8 sequence. Malformed bytes strip — but only
        // THEMSELVES: a stray continuation/overlong lead advances one
        // byte, and a truncated sequence consumes only its actual
        // continuation bytes, so valid neighbors always survive (the
        // composable twin decodes malformed bytes to U+FFFD, which the
        // [^a-z0-9 ] strip then removes — same survivors)
        val first = b & 0xFF
        if (first < 0xC2 || first > 0xF4) i += 1 // not a valid lead
        else {
          val len = if (first < 0xE0) 2 else if (first < 0xF0) 3 else 4
          var cp = first & (if (len == 2) 0x1F else if (len == 3) 0x0F else 0x07)
          var k = 1
          while (k < len && i + k < n && (s.getByte(i + k) & 0xC0) == 0x80) {
            cp = (cp << 6) | (s.getByte(i + k) & 0x3F)
            k += 1
          }
          // reject overlong encodings (cp below the minimum for the
          // sequence length) and beyond-plane values: the twin's
          // decoder replaces them with U+FFFD (stripped), so a naive
          // accept here would emit a survivor the twin never sees —
          // e.g. E0 81 A1 is an overlong 'a'. len==2 can't be overlong
          // (leads <0xC2 are already rejected above). Surrogate
          // codepoints (0xD800-0xDFFF) need no special case: they
          // lowercase to themselves, which is not in [a-z0-9].
          val wellFormed = k == len &&
            (len == 2 || (len == 3 && cp >= 0x800) ||
              (len == 4 && cp >= 0x10000 && cp <= 0x10FFFF))
          if (wellFormed) {
            val lc = Character.toLowerCase(cp)
            if (lc >= 'a' && lc <= 'z' || lc >= '0' && lc <= '9') {
              if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
              out(o) = lc.toByte; o += 1
            }
          }
          i += k
        }
      }
    }
    val d = md5.get()
    d.reset()
    d.update(out, 0, o)
    val dig = d.digest()
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((dig(j) >> 4) & 0xF)
      hex(2 * j + 1) = HexDigits(dig(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }
}
