package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document adjacent character-pair occurrence counts in ONE
  * row-local byte pass: `map<string, long>` of every 2-codepoint
  * window inside every space-separated word (TextAnalysis #34n, the
  * BPE-training pair table).
  *
  * The pair domain is ≤ charset² while pair POSITIONS are Σ|word| —
  * the explode+explode form (one row per word, then one row per
  * position) feeds the partial aggregate |doc| generator rows per
  * document where this kernel feeds it |distinct pairs| (bounded,
  * typically 100× fewer), and skips the per-word array/substring
  * allocations entirely. Downstream `explode → sum` is bit-identical
  * to the positional `explode → count` by construction (asserted by
  * PairCountsSpec against the composable twin on real and adversarial
  * corpora). Multibyte-safe: words split on the ASCII space byte
  * (never a UTF-8 continuation byte) and pairs step whole code
  * points, matching `substring(word, i, 2)` semantics. Fewer than 2
  * code points in a word → no pairs (the twin's `length(word) >= 2`
  * guard). Registered as `graft_pair_counts`
  * ([[graft.plans.GraftExtensions]]).
  */
case class PairCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_pair_counts expects string, got ${t.simpleString}")
    }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    PairCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PairCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_pair_counts"
}

object PairCounts {

  /** UTF-8 sequence length from its first byte (continuation bytes
    * cannot start a word character here — input is well-formed UTF8String). */
  private def cpLen(b: Byte): Int =
    if ((b & 0x80) == 0) 1
    else if ((b & 0xE0) == 0xC0) 2
    else if ((b & 0xF0) == 0xE0) 3
    else 4

  def compute(s: UTF8String): MapData = {
    val bytes = s.getBytes
    val nB = bytes.length
    val counts = new java.util.HashMap[String, Array[Long]]()
    var ws = 0 // current word start
    var i = 0
    while (i <= nB) {
      if (i == nB || bytes(i) == 0x20) {
        // word is bytes[ws, i): emit every adjacent code-point pair
        if (i - ws >= 2) {
          var p0 = ws                    // start of the pair's first cp
          var p1 = ws + cpLen(bytes(ws)) // start of the pair's second cp
          while (p1 < i) {
            val p2 = p1 + cpLen(bytes(p1)) // end of the pair
            val g = new String(bytes, p0, math.min(p2, i) - p0,
              java.nio.charset.StandardCharsets.UTF_8)
            val c = counts.get(g)
            if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
            p0 = p1
            p1 = p2
          }
        }
        ws = i + 1
      }
      i += 1
    }
    val n = counts.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue()(0)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
