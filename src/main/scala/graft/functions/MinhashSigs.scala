package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 16 MinHash signature values of a document's word-3-gram shingle
  * set in ONE pass over the raw UTF-8 bytes — row-local, so the
  * signature stage of MinHash+LSH dedup is map-only (Dedup #29).
  *
  * Value-identical to `min(perm_i(h)) GROUP BY doc` over the exploded
  * shingle index: each shingle's md5 runs over a byte slice of the
  * input (see [[TokenBytes]]), the 16 universal-hash permutations are
  * the same `(a·(h mod P) + b) mod P` family, and min over the shingle
  * MULTISET equals min over the set — duplicates cannot change a
  * minimum, so unlike [[SimhashText]] no dedup structure is needed at
  * all. Docs with fewer than 3 tokens return null (the aggregate form
  * emitted no row). The DuckDB oracle (independent SQL recompute of
  * shingles → perms → mins → bands → pair join) is unchanged and gates
  * this expression end-to-end through the pair output. Registered as
  * `graft_minhash_sigs` ([[graft.plans.GraftExtensions]]).
  */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_sigs expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("minhashSigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.MinhashSigs.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sigs"
}

object MinhashSigs {

  /** Shingle width (== [[Shingles.N]]) and perm count (== Dedup.NumPerms). */
  private val N = 3
  private val K = 16

  private val A = new Array[Long](K)
  private val B = new Array[Long](K)
  (0 until K).foreach { i =>
    val (a, b) = PortableHash.permCoef(i)
    A(i) = a; B(i) = b
  }

  /** null ⇔ fewer than 3 tokens (no shingles). */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nB = bytes.length
    val starts = TokenBytes.tokenStarts(bytes)
    val m = starts.length
    if (m < N) return null
    val dig = TokenBytes.md5.get()
    val mins = Array.fill(K)(Long.MaxValue)
    var sh = 0
    while (sh <= m - N) {
      val from = starts(sh)
      val to = if (sh + N < m) starts(sh + N) - 1 else nB
      val h = TokenBytes.hash60(dig, bytes, from, to)
      val hp = h % PortableHash.P
      var i = 0
      while (i < K) {
        val p = (hp * A(i) + B(i)) % PortableHash.P
        if (p < mins(i)) mins(i) = p
        i += 1
      }
      sh += 1
    }
    new GenericArrayData(mins)
  }
}
