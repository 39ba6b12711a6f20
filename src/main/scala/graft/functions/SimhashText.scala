package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document's distinct word-3-gram shingle set in
  * ONE pass over the raw UTF-8 bytes — row-local, so the dedup
  * signature stage is map-only (Dedup #30).
  *
  * Bit-for-bit identical to the composable pipeline it replaces
  * (explode [[Shingles.hashedFromTokens]] → 4 [[PortableHash.perm]]
  * columns → 64 bit-vote sums → sign bits), which cost an interpreted
  * per-shingle lambda, a (doc, 4×long)-row shuffle, and a 64-column
  * aggregation buffer per doc. Key byte-level identity: `split(text,
  * " ")` separates on SINGLE spaces, so the 3-gram
  * `concat_ws(" ", w[i], w[i+1], w[i+2])` is exactly the original
  * byte range from token i's start to token i+2's end — each shingle
  * md5 runs over a slice of the input, no string is ever built.
  * Dedup is on the 60-bit hash (same as `array_distinct` over the
  * hashed array). Docs with fewer than 3 tokens return null (the
  * composable form emitted no row; callers filter).
  *
  * The independent DuckDB oracle (string-level DISTINCT + the same
  * md5/perm math in SQL) stays unchanged — the driver's hash compare
  * validates this expression end-to-end. Registered as
  * `graft_simhash` ([[graft.plans.GraftExtensions]]).
  */
case class SimhashText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimhashText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("simhash")
      s"""
         |java.lang.Long $r = graft.functions.SimhashText.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimhashText {

  /** Shingle width (== [[Shingles.N]]). */
  private val N = 3

  /** Perm coefficients for the 4×16-bit groups, derived exactly as the
    * column pipeline derives them (Dedup.SimhashPermBase = 101). */
  private val Coefs: Array[(Long, Long)] =
    Array.tabulate(4)(g => PortableHash.permCoef(101 + g))

  /** null ⇔ fewer than 3 tokens (no shingles). */
  def compute(s: UTF8String): java.lang.Long = {
    val bytes = s.getBytes
    val nB = bytes.length
    val starts = TokenBytes.tokenStarts(bytes)
    val m = starts.length
    if (m < N) return null
    val dig = TokenBytes.md5.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    val votes = new Array[Int](64)
    var g = 0
    var sh = 0
    while (sh <= m - N) {
      val from = starts(sh)
      val to = if (sh + N < m) starts(sh + N) - 1 else nB
      val h = TokenBytes.hash60(dig, bytes, from, to)
      if (seen.add(h)) {
        g = 0
        while (g < 4) {
          val (a, b) = Coefs(g)
          val p = (h % PortableHash.P * a + b) % PortableHash.P
          var j = 0
          while (j < 16) {
            votes(g * 16 + j) += (if (((p >> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
          g += 1
        }
      }
      sh += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }
}
