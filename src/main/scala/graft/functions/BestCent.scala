package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Best-cosine centroid of a quantized vector against a literal
  * row-major `k × dims` centroid matrix, in ONE pass.
  *
  * Replaces the composable `greatest(struct(cosine(dot(qv, c_j)), j))`
  * tree — k literal arrays and ~4k nodes whose ANALYSIS AND CODEGEN
  * dominate wall-clock at any data size (the same pathology
  * [[SignBuckets]] and [[PqCodes]] eliminate for LSH/PQ; measured for
  * k=32: ~1.3 s of constant driver time per query). Emits
  * `struct<s: double, j: int>` — the winning score and centroid id.
  *
  * Bit-for-bit contract (the DuckDB oracle twins depend on it):
  * `s_j = (double) dot_j / sqrt((double) n2 * (double) cn2_j)` with
  * `n2`/`cn2_j` exact int64 sums recomputed inside the kernel (the
  * identical integers the column pipeline carries), and the winner is
  * the lexicographic max of `(s, j)` under Spark's double ordering
  * (ties to the HIGHER id; NaN greatest — `Double.compare` reproduces
  * both), matching `ORDER BY s DESC, j DESC` in SQL.
  *
  * Registered as SQL function `graft_best_cent(vec, cmat)`.
  */
case class BestCent(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_best_cent expects (array<bigint> vec, array<bigint> cmat), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = false),
    StructField("j", IntegerType, nullable = false)))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cmat = b.asInstanceOf[ArrayData]
    val dims = vec.numElements()
    val k = cmat.numElements() / dims
    var n2 = 0L
    var d = 0
    while (d < dims) { val v = vec.getLong(d); n2 += v * v; d += 1 }
    var bestS = Double.NegativeInfinity
    var bestJ = -1
    var j = 0
    while (j < k) {
      var dot = 0L
      var cn2 = 0L
      d = 0
      while (d < dims) {
        val c = cmat.getLong(j * dims + d)
        dot += vec.getLong(d) * c
        cn2 += c * c
        d += 1
      }
      val s = dot.toDouble / math.sqrt(n2.toDouble * cn2.toDouble)
      if (java.lang.Double.compare(s, bestS) >= 0) { bestS = s; bestJ = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestS, bestJ))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cmat) => {
      val dims = ctx.freshName("dims")
      val k = ctx.freshName("k")
      val n2 = ctx.freshName("n2")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val cn2 = ctx.freshName("cn2")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val bestS = ctx.freshName("bestS")
      val bestJ = ctx.freshName("bestJ")
      s"""
         |int $dims = $vec.numElements();
         |int $k = $cmat.numElements() / $dims;
         |long $n2 = 0L;
         |for (int $d = 0; $d < $dims; $d++) {
         |  long v = $vec.getLong($d); $n2 += v * v;
         |}
         |double $bestS = Double.NEGATIVE_INFINITY;
         |int $bestJ = -1;
         |for (int $j = 0; $j < $k; $j++) {
         |  long $dot = 0L; long $cn2 = 0L;
         |  for (int $d = 0; $d < $dims; $d++) {
         |    long $c = $cmat.getLong($j * $dims + $d);
         |    $dot += $vec.getLong($d) * $c;
         |    $cn2 += $c * $c;
         |  }
         |  double $s = (double) $dot / Math.sqrt((double) $n2 * (double) $cn2);
         |  if (Double.compare($s, $bestS) >= 0) { $bestS = $s; $bestJ = $j; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestS, $bestJ});
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCent =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_best_cent"
}
