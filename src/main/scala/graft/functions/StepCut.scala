package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Step-function lookup over a literal breakpoint table: the value of
  * the first step whose boundary exceeds the probe, by binary search.
  *
  * `graft_step_cut(seq, steps)` with `steps` the flattened sorted
  * `[boundary₀, value₀, boundary₁, value₁, …]` pair array returns
  * `valueᵢ` for the smallest `boundaryᵢ > seq`, NULL when `seq` is at
  * or past the last boundary.
  *
  * Exists because the chained-CaseWhen encoding of the same step
  * function generates one comparison branch per step: past a few
  * hundred steps the generated `processNext()` overflows Janino's
  * method limits and the WHOLE STAGE falls back to interpreted eval
  * (observed at sf1 for [[graft.operators.UndoCanonicalizer]] — 10×
  * the reorg signals of sf0.1). One tree node + an O(log n) loop stays
  * inside whole-stage codegen at any step count.
  */
case class StepCut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_step_cut expects (bigint seq, array<bigint> steps), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val seq = a.asInstanceOf[Long]
    val steps = b.asInstanceOf[ArrayData]
    val n = steps.numElements() / 2
    // first i with boundary_i > seq
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (steps.getLong(2 * mid) > seq) hi = mid else lo = mid + 1
    }
    if (lo == n) null else java.lang.Long.valueOf(steps.getLong(2 * lo + 1))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seq, steps) => {
      val n = ctx.freshName("n")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $n = $steps.numElements() / 2;
         |int $lo = 0; int $hi = $n;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($steps.getLong(2 * $mid) > $seq) $hi = $mid; else $lo = $mid + 1;
         |}
         |if ($lo < $n) {
         |  ${ev.value} = $steps.getLong(2 * $lo + 1);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StepCut =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_step_cut"
}
