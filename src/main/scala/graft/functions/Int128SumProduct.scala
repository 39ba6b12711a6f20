package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EvalMode, Expression, If, IsNull, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, BitwiseNot, BitwiseOr, EqualTo, Multiply, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, IntegerType, LongType}

/** Exact `SUM(a * b)` over two bigint columns in a two's-complement
  * int128 accumulator — the Spark-native analogue of DuckDB's native
  * HUGEINT sum, for the typed-BigInt surface whose semantics are
  * exact at any magnitude (reference writer.go:268-276 serializes
  * BigInt as decimal text).
  *
  * WHY: the declarative form `sum(cast(a AS decimal(19,0)) * cast(b
  * AS decimal(19,0)))` pays a per-row java.math.BigDecimal multiply —
  * precision 38 never fits Spark's compact Decimal — and the long
  * fast path is semantically impossible on real key magnitudes
  * (measured at sf10: keys ~1e10, products ~1e20 > Long.Max, ANSI
  * multiply throws). Here the per-row work is `Math.multiplyHigh` +
  * one wrapping multiply + a carry-propagating 128-bit add: primitive
  * long ops, zero allocation; BigDecimal appears once per GROUP at
  * the final evaluation.
  *
  * Implemented as a [[DeclarativeAggregate]] over three LongType
  * buffer slots (hi, lo, rowsSeen) — fixed-width buffers keep it in
  * HashAggregateExec WITH whole-stage codegen, fused into the scan
  * stage (the TypedImperativeAggregate form was measured 0.76 s at
  * sf10 on the interpreted ObjectHashAggregate path vs 1.44 s for the
  * BigDecimal form; this form drops the per-row virtual eval too).
  * The wrapping multiply/adds the carry math needs are built with
  * explicit `EvalMode.LEGACY` so ANSI mode can't turn an intended
  * two's-complement wrap into an error; `Math.multiplyHigh` and the
  * overflow-checked high-word add go through [[StaticInvoke]], which
  * codegen emits as direct static calls.
  *
  * Exactness: the 128-bit product of two signed 64-bit longs is exact
  * by construction; 128-bit addition overflow is detected with the
  * sign rule ((x ^ r) & (y ^ r) < 0 on the high words, valid because
  * the carry-included high word IS the true result's high word) and
  * FAILS LOUDLY like ANSI arithmetic — exact-or-throw, never a silent
  * wrap. Headroom: |sum| < 2^127 ≈ 1.7e38 internally, and the final
  * Decimal(38,0) conversion throws past 1e38 rather than truncating —
  * ~1e5 times the sum a 100 TB corpus of 1e13 rows × 1e20 products
  * reaches (1e33).
  *
  * Null semantics match SUM: a null on either side skips the row; a
  * group with no surviving rows evaluates to null. Vector-pinned
  * against the exact-decimal twin in Int128Spec; gl_typed_bigint's
  * oracle (DuckDB HUGEINT arithmetic) gates it end-to-end at every
  * SF. Registered as SQL function `graft_sum128_product`. */
case class Int128SumProduct(left: Expression, right: Expression)
  extends DeclarativeAggregate with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sum128_product expects (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sum128_product"

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(0L))

  // wrapping two's-complement ops — explicitly LEGACY so ANSI can't
  // reject the intended wraps
  private def wAdd(a: Expression, b: Expression) = Add(a, b, EvalMode.LEGACY)
  private def wMul(a: Expression, b: Expression) = Multiply(a, b, EvalMode.LEGACY)
  private def mulHigh(a: Expression, b: Expression) =
    StaticInvoke(classOf[java.lang.Math], LongType, "multiplyHigh",
      Seq(a, b), Seq(LongType, LongType), returnNullable = false)
  // overflow-CHECKED high-word add (throws past 2^127) — the one
  // non-inline step, a static call codegen emits directly
  private def addHiChecked(h0: Expression, h1: Expression, carry: Expression) =
    StaticInvoke(Int128Ops.getClass, LongType, "addHiChecked",
      Seq(h0, h1, carry), Seq(LongType, LongType, LongType), returnNullable = false)
  /** carry out of the unsigned low-word add: (l0&l1 | (l0|l1)&~sum) >>> 63 */
  private def carryOut(l0: Expression, l1: Expression, sum: Expression) =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(l0, l1), BitwiseAnd(BitwiseOr(l0, l1), BitwiseNot(sum))),
      Literal(63, IntegerType))

  /** (hi, lo) += (addHi, addLo); returns the (newHi, newLo) pair. */
  private def add128(addHi: Expression, addLo: Expression): (Expression, Expression) = {
    val newLo = wAdd(lo, addLo)
    val newHi = addHiChecked(hi, addHi, carryOut(lo, addLo, newLo))
    (newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(IsNull(left), IsNull(right))
    val (newHi, newLo) = add128(mulHigh(left, right), wMul(left, right))
    Seq(
      If(skip, hi, newHi),
      If(skip, lo, newLo),
      If(skip, seen, wAdd(seen, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val otherEmpty = EqualTo(seen.right, Literal(0L))
    val newLo = wAdd(lo.left, lo.right)
    val newHi = addHiChecked(hi.left, hi.right, carryOut(lo.left, lo.right, newLo))
    Seq(
      If(otherEmpty, hi.left, newHi),
      If(otherEmpty, lo.left, newLo),
      wAdd(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression =
    If(EqualTo(seen, Literal(0L)),
      Literal(null, DecimalType(38, 0)),
      StaticInvoke(Int128Ops.getClass, DecimalType(38, 0), "toDecimal38",
        Seq(hi, lo), Seq(LongType, LongType), returnNullable = false))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128SumProduct =
    copy(left = newLeft, right = newRight)
}

/** Static kernels for [[Int128SumProduct]]'s StaticInvoke calls. */
object Int128Ops {
  /** High-word add with signed-128 overflow detection: `carry` is the
    * true carry out of the low word, so `h0 + h1 + carry` IS the
    * result's high word and the standard sign rule applies. */
  def addHiChecked(h0: Long, h1: Long, carry: Long): Long = {
    val r = h0 + h1 + carry
    if (((h0 ^ r) & (h1 ^ r)) < 0)
      throw new ArithmeticException(
        "graft_sum128_product: int128 overflow (|sum| >= 2^127)")
    r
  }

  /** Two's-complement (hi, lo) → Decimal(38,0); throws past 1e38. */
  def toDecimal38(hi: Long, lo: Long): Decimal = {
    val bytes = new Array[Byte](16)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putLong(hi); bb.putLong(lo)
    Decimal(BigDecimal(new java.math.BigInteger(bytes)), 38, 0)
  }
}
