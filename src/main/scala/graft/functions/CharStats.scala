package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-string character-histogram statistics in ONE pass:
  * `struct(n_ch, distinct_chars, sumsq)` where `sumsq = Σ count(c)²`
  * over the string's code points — the moments behind the Simpson
  * diversity index (TextAnalysis #34k).
  *
  * Why a native expression: the per-document histogram is row-local,
  * so the operator should be map-only — but the two composable
  * zero-shuffle forms both lose. Higher-order lambdas
  * (`array_sort` + `filter` + `aggregate`) are interpreted per
  * element (measured 2× slower than even an explode + double-groupBy
  * at sf0.1), and the explode form is whole-stage-codegen'd but
  * shuffles up to |alphabet| rows per document — at corpus scale
  * that's shuffle volume comparable to the input itself for what is
  * conceptually a scan. This expression keeps the zero-shuffle shape
  * AND the compiled inner loop: one fused byte-level pass, an
  * `int[128]` ASCII fast path, no per-row boxing. Registered as the
  * SQL function `graft_char_stats` ([[graft.plans.GraftExtensions]]).
  *
  * `sumsq` fits a long with no overflow check needed: Spark strings
  * hold < 2³¹ chars and Σc² ≤ n² < 2⁶²; downstream ppb math widens to
  * decimal(38). Semantics: counts are Unicode CODE POINTS (matches
  * `split(text,'')` and DuckDB `string_split(text,'')` for BMP text;
  * the testdata is ASCII). Empty string → (0, 0, 0), null → null.
  */
case class CharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_char_stats expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_ch", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    CharStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)

  override def prettyName: String = "graft_char_stats"
}

object CharStats {

  /** ASCII strings (all of the testdata, and the common case for
    * web-scale English corpora) take one branch-light pass over the
    * raw bytes into a `long[128]` table. The first negative byte
    * aborts to the general code-point path over the decoded string —
    * correct across multi-byte sequences and surrogate pairs, still
    * one histogram pass. */
  def compute(s: UTF8String): InternalRow = {
    val nBytes = s.numBytes()
    val ascii = new Array[Long](128)
    var i = 0
    var allAscii = true
    while (allAscii && i < nBytes) {
      val b = s.getByte(i)
      if (b >= 0) { ascii(b) += 1; i += 1 } else allAscii = false
    }
    var map: java.util.HashMap[Integer, Long] = null
    if (!allAscii) {
      java.util.Arrays.fill(ascii, 0L)
      map = new java.util.HashMap[Integer, Long]()
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        if (cp < 128) ascii(cp) += 1
        else {
          val k = Integer.valueOf(cp)
          // getOrDefault keeps the missing-key case explicit — a bare
          // map.get unboxes to a primitive Long, where null silently
          // becomes 0L and a null check can never fire
          map.put(k, map.getOrDefault(k, 0L) + 1L)
        }
        j += Character.charCount(cp)
      }
    }
    var n = 0L; var distinct = 0L; var sumsq = 0L
    var a = 0
    while (a < 128) {
      val c = ascii(a)
      if (c > 0) { n += c; distinct += 1; sumsq += c * c }
      a += 1
    }
    if (map != null) {
      val it = map.values().iterator()
      while (it.hasNext) {
        val c = it.next(); n += c; distinct += 1; sumsq += c * c
      }
    }
    new GenericInternalRow(Array[Any](n, distinct, sumsq))
  }
}
