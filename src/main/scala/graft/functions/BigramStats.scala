package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token-bigram repetition moments in ONE row-local pass:
  * `struct(n_tok, top_cnt, dup_cnt)` — token count, the count of the
  * most frequent bigram, and the number of bigram positions whose
  * bigram repeats (TextAnalysis #34f, the Gopher-style filters).
  *
  * The metric is fully contained in the row, so the operator should be
  * map-only; the aggregate form (explode one row per bigram position →
  * count per (doc, bigram) → per-doc rollup) shuffles every bigram
  * position twice for what is conceptually a scan. Tokens come from
  * single-space splitting, so each bigram is a byte range of the input
  * string; counting is EXACT (a per-doc string-keyed map, no hashing —
  * bit-identical to the aggregate form by construction, asserted by
  * spec on the corpus). Fewer than 2 tokens → null (the aggregate form
  * emitted no row). Registered as `graft_bigram_stats`
  * ([[graft.plans.GraftExtensions]]).
  */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bigram_stats expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("dup_cnt", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BigramStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("bigramStats")
      s"""
         |InternalRow $r = graft.functions.BigramStats.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BigramStats =
    copy(child = newChild)

  override def prettyName: String = "graft_bigram_stats"
}

object BigramStats {

  /** null ⇔ fewer than 2 tokens (no bigram slots). */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val nB = bytes.length
    var m = 1
    var i = 0
    while (i < nB) { if (bytes(i) == 0x20) m += 1; i += 1 }
    if (m < 2) return null
    val starts = new Array[Int](m)
    var t = 1
    i = 0
    while (i < nB) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val counts = new java.util.HashMap[String, Array[Long]]()
    var sh = 0
    while (sh <= m - 2) {
      val from = starts(sh)
      val to = if (sh + 2 < m) starts(sh + 2) - 1 else nB
      val g = new String(bytes, from, to - from,
        java.nio.charset.StandardCharsets.UTF_8)
      val c = counts.get(g)
      if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
      sh += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any](m.toLong, top, dup))
  }
}
