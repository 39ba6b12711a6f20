package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Product-quantization kernels (SURVEY.md §2 #33c).
  *
  * The composable form — per subspace, 16 `graft_long_dot` + `struct`
  * + `greatest` trees — builds a ~400-node expression whose analysis
  * and codegen dominate wall-clock at ANY data size (the same
  * pathology [[SignBuckets]] fixed for the LSH family). Each kernel
  * here is ONE tree node running a fused loop over the flattened
  * codebook literal.
  *
  * Both take `(vec: array<bigint>, books: array<bigint>, m: int)`
  * where `books` is the (m-major, then code, then dim) flattened
  * `M × K × (dims/M)` codebook and `m` is the subspace count M;
  * `K` is derived as `books.length / vec.length`.
  */
private[graft] trait PqKernel extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint> vec, array<bigint> books, int m), got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString})")
    }
}

/** `graft_pq_codes(vec, books, m)` → `array<int>` of M codes: per
  * subspace, the argmin-L2 codebook entry. argmin ‖sub − c‖² ==
  * argmax (2·dot(sub, c) − ‖c‖²) since ‖sub‖² is constant across
  * codes; ties break to the LOWER code id (strict `>` keeps the first
  * maximum), matching the composable formulation's `greatest` over
  * `(score, −j)` structs. */
case class PqCodes(first: Expression, second: Expression, third: Expression)
    extends PqKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val numM = c.asInstanceOf[Int]
    val dims = vec.numElements()
    val sub = dims / numM
    val k = books.numElements() / dims
    val out = new Array[Int](numM)
    var m = 0
    while (m < numM) {
      var best = 0; var bestScore = Long.MinValue
      var j = 0
      while (j < k) {
        var dot = 0L; var cn2 = 0L
        val base = (m * k + j) * sub
        var d = 0
        while (d < sub) {
          val cv = books.getLong(base + d)
          dot += vec.getLong(m * sub + d) * cv
          cn2 += cv * cv
          d += 1
        }
        val score = 2L * dot - cn2
        if (score > bestScore) { bestScore = score; best = j }
        j += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, books, numM) => {
      val dims = ctx.freshName("dims"); val sub = ctx.freshName("sub")
      val k = ctx.freshName("k"); val out = ctx.freshName("out")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val cn2 = ctx.freshName("cn2"); val cv = ctx.freshName("cv")
      val base = ctx.freshName("base"); val score = ctx.freshName("score")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      s"""
         |int $dims = $vec.numElements();
         |int $sub = $dims / $numM;
         |int $k = $books.numElements() / $dims;
         |int[] $out = new int[$numM];
         |for (int $m = 0; $m < $numM; $m++) {
         |  int $best = 0; long $bestScore = Long.MIN_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $dot = 0L; long $cn2 = 0L;
         |    int $base = ($m * $k + $j) * $sub;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      long $cv = $books.getLong($base + $d);
         |      $dot += $vec.getLong($m * $sub + $d) * $cv;
         |      $cn2 += $cv * $cv;
         |    }
         |    long $score = 2L * $dot - $cn2;
         |    if ($score > $bestScore) { $bestScore = $score; $best = $j; }
         |  }
         |  $out[$m] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqCodes =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_pq_codes"
}

/** `graft_pq_table(vec, books, m)` → flat `array<bigint>` of M·K ADC
  * entries: element `m·K + j` = dot(sub_m(vec), books[m][j]) — the
  * per-query lookup table asymmetric distance computation reads with
  * `table[m·K + code[m]]`. */
case class PqTable(first: Expression, second: Expression, third: Expression)
    extends PqKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val numM = c.asInstanceOf[Int]
    val dims = vec.numElements()
    val sub = dims / numM
    val k = books.numElements() / dims
    val out = new Array[Long](numM * k)
    var m = 0
    while (m < numM) {
      var j = 0
      while (j < k) {
        var dot = 0L
        val base = (m * k + j) * sub
        var d = 0
        while (d < sub) {
          dot += vec.getLong(m * sub + d) * books.getLong(base + d)
          d += 1
        }
        out(m * k + j) = dot
        j += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, books, numM) => {
      val dims = ctx.freshName("dims"); val sub = ctx.freshName("sub")
      val k = ctx.freshName("k"); val out = ctx.freshName("out")
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      s"""
         |int $dims = $vec.numElements();
         |int $sub = $dims / $numM;
         |int $k = $books.numElements() / $dims;
         |long[] $out = new long[$numM * $k];
         |for (int $m = 0; $m < $numM; $m++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $dot = 0L;
         |    int $base = ($m * $k + $j) * $sub;
         |    for (int $d = 0; $d < $sub; $d++) {
         |      $dot += $vec.getLong($m * $sub + $d) * $books.getLong($base + $d);
         |    }
         |    $out[$m * $k + $j] = $dot;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqTable =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_pq_table"
}
