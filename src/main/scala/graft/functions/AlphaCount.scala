package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of lowercase ASCII letters (a-z) in a string — the exact
  * value of `length(regexp_replace(text, '[^a-z]', ''))`, computed as
  * ONE branch-light pass over the raw UTF-8 bytes instead of a regex
  * scan that BUILDS the stripped string only to take its length
  * (round 13; the quality gate ran that regex once per document in
  * tx_quality_score, tx_curation, and dd_keep_best's quality side).
  *
  * Byte-counting is exact for EVERY input, valid UTF-8 or not:
  *   - bytes 0x61-0x7A never occur inside a multi-byte sequence
  *     (continuations are 0x80-0xBF, leads ≥ 0xC2), so each such byte
  *     IS a standalone a-z code point;
  *   - no multi-byte sequence decodes to a-z (those decode ≥ U+0080);
  *   - under malformed input, the decoder's replacement consumes only
  *     the malformed unit — a following ASCII byte still decodes as
  *     itself — so the count matches the sanitizing regex path there
  *     too (AlphaCountSpec pins an invalid-UTF-8 fixture).
  *
  * Registered as `graft_alpha_count` ([[graft.plans.GraftExtensions]]).
  */
case class AlphaCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_alpha_count expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    AlphaCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AlphaCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AlphaCount =
    copy(child = newChild)

  override def prettyName: String = "graft_alpha_count"
}

object AlphaCount {
  def compute(s: UTF8String): Long = {
    val n = s.numBytes()
    var i = 0
    var c = 0L
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') c += 1L
      i += 1
    }
    c
  }
}
