package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** All sign-LSH bucket keys of a quantized vector in ONE pass.
  *
  * The composable form — one `graft_long_dot` + `when`/`concat` chain
  * per plane — builds a ~64-expression tree per row batch whose
  * ANALYSIS AND CODEGEN dominate wall-clock on realistic corpora
  * (measured: the 8-table bucketing tree costs seconds of driver time
  * per query at any data size). This expression takes the flattened
  * ±1 plane matrix (`planes × dims`, row-major) as its right literal
  * input and emits `array<int>`: element t is the `planesPerBucket`-bit
  * bucket key of plane group t — 4096 fused multiply-adds in a single
  * codegen'd loop, one tree node.
  *
  * Registered as SQL function `graft_sign_buckets(vec, signs)` with
  * [[SignBuckets.PlanesPerBucket]]-bit groups.
  */
case class SignBuckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_sign_buckets expects (array<bigint> vec, array<bigint> signs), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val g = SignBuckets.PlanesPerBucket

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val signs = b.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val nPlanes = signs.numElements() / dims
    val out = new Array[Int](nPlanes / g)
    var p = 0
    while (p < (out.length * g)) {
      var acc = 0L
      var d = 0
      while (d < dims) { acc += vec.getLong(d) * signs.getLong(p * dims + d); d += 1 }
      if (acc >= 0L) out(p / g) |= 1 << (p % g)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, signs) => {
      val dims = ctx.freshName("dims")
      val nOut = ctx.freshName("nOut")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $dims = $vec.numElements();
         |int $nOut = ($signs.numElements() / $dims) / $g;
         |int[] $out = new int[$nOut];
         |for (int $p = 0; $p < $nOut * $g; $p++) {
         |  long $acc = 0L;
         |  for (int $d = 0; $d < $dims; $d++) {
         |    $acc += $vec.getLong($d) * $signs.getLong($p * $dims + $d);
         |  }
         |  if ($acc >= 0L) $out[$p / $g] |= 1 << ($p % $g);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignBuckets =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sign_buckets"
}

object SignBuckets {
  /** Bits per bucket key — one LSH table per group of 8 planes. */
  val PlanesPerBucket = 8
}
