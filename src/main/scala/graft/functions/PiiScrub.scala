package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII scrub in ONE pass: `struct(n_email, n_ipv4, n_phone,
  * scrubbed)` — the three sequential detect-replace-count passes of
  * TextAnalysis #34h (emails → IPv4 → phones, each counted on the text
  * remaining after the earlier replacements) collapsed into a single
  * expression. Registered as `graft_pii_scrub`
  * ([[graft.plans.GraftExtensions]]).
  *
  * Why a native expression: the composable form is six regex
  * traversals per document (a `regexp_replace` AND a
  * `regexp_extract_all` per kind) plus four intermediate UTF8String
  * materializations — for a map-only operator whose plan shape is
  * already optimal, the per-row constant factor IS the cost. This
  * kernel (a) counts DURING replacement, halving the regex passes,
  * (b) materializes the Java string at most once, and (c) gates each
  * pattern behind a byte-level TRIGGER scan — a document with no `@`
  * cannot contain an email, no `+digit` no phone, no `digit.digit` no
  * IPv4, so the common clean-document case never runs a regex at all.
  * Trigger bytes are scanned on the ORIGINAL text, which is sound: a
  * replacement token is letters/`<`/`>` only, so later passes can
  * never gain a trigger the original lacked (false-positive triggers
  * cost a wasted scan, never correctness).
  *
  * Parity: matching/replacement use the same `java.util.regex` engine
  * and find-loop traversal as Spark's own `regexp_replace` /
  * `regexp_extract_all`, so equality with the composable chain is
  * structural — and spec-pinned anyway (the kernel-twin contract).
  * The pattern strings below are the canonical definitions;
  * TextAnalysis aliases them into its oracle SQL.
  */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pii_scrub expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_email", LongType, nullable = false),
    StructField("n_ipv4", LongType, nullable = false),
    StructField("n_phone", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    PiiScrub.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScrub.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)

  override def prettyName: String = "graft_pii_scrub"
}

object PiiScrub {

  /** Portable (Java-regex ∩ RE2) patterns — no lookaround, no
    * backreferences (those diverge between engines). */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9]{7,15}"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  private val email = java.util.regex.Pattern.compile(EmailPattern)
  private val ipv4 = java.util.regex.Pattern.compile(Ipv4Pattern)
  private val phone = java.util.regex.Pattern.compile(PhonePattern)

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** find-loop replace with the count riding along; returns the input
    * string unchanged (no copy) when nothing matches. All three
    * patterns require ≥1 char, so the loop cannot stall on an empty
    * match. */
  private def replaceCount(p: java.util.regex.Pattern, s: String,
                           repl: String): (String, Long) = {
    val m = p.matcher(s)
    if (!m.find()) (s, 0L)
    else {
      val sb = new java.lang.StringBuilder(s.length)
      var c = 0L
      var last = 0
      while ({
        sb.append(s, last, m.start()); sb.append(repl); last = m.end(); c += 1
        m.find()
      }) ()
      sb.append(s, last, s.length)
      (sb.toString, c)
    }
  }

  def compute(s: UTF8String): InternalRow = {
    val n = s.numBytes()
    var hasAt = false; var hasPlusDigit = false; var hasDdd = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == '@') hasAt = true
      else if (b == '+') {
        if (i + 1 < n && isDigit(s.getByte(i + 1))) hasPlusDigit = true
      } else if (b == '.') {
        if (i > 0 && isDigit(s.getByte(i - 1)) &&
          i + 1 < n && isDigit(s.getByte(i + 1))) hasDdd = true
      }
      i += 1
    }
    if (!hasAt && !hasDdd && !hasPlusDigit)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, s))
    var str = s.toString
    var nEmail = 0L; var nIp = 0L; var nPhone = 0L
    if (hasAt) {
      val r = replaceCount(email, str, EmailToken); str = r._1; nEmail = r._2
    }
    if (hasDdd) {
      val r = replaceCount(ipv4, str, IpToken); str = r._1; nIp = r._2
    }
    if (hasPlusDigit) {
      val r = replaceCount(phone, str, PhoneToken); str = r._1; nPhone = r._2
    }
    new GenericInternalRow(Array[Any](nEmail, nIp, nPhone,
      if ((nEmail | nIp | nPhone) == 0L) s else UTF8String.fromString(str)))
  }
}
