package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Drop-in twin of Spark's `md5()` with the per-row constant removed:
  * the built-in codegen calls commons-codec `DigestUtils.md5Hex`,
  * which runs `MessageDigest.getInstance("MD5")` — a synchronized
  * JCA provider lookup — and two intermediate allocations (char[] hex
  * + String + UTF8String re-encode) for EVERY row. This expression
  * reuses a thread-local digest and writes hex bytes straight into
  * the result UTF8String, exactly the [[NormFingerprint]] kernel's
  * tail. Output is bit-identical to `md5()` (twin-gated in
  * PropertySpec), so oracle SQL keeps using plain `md5` — the hash IS
  * the semantic, only the constant factor moves.
  *
  * Motivation: the exact-dedup family hashes every document it ever
  * touches (dd_exact and the standing states it feeds) — at 100 TB
  * the md5 pass is a first-class cost, and a ~2x per-row constant is
  * the difference between hashing at scan speed and hashing as the
  * bottleneck. Registered as `graft_md5`. */
case class Md5Hex(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_md5 expects string or binary, got ${t.simpleString}")
    }

  override def dataType: DataType = StringType

  private lazy val isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) Md5Hex.computeUtf8(input.asInstanceOf[UTF8String])
    else Md5Hex.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isString)
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hex.computeUtf8($c)")
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hex.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hex =
    copy(child = newChild)

  override def prettyName: String = "graft_md5"
}

object Md5Hex {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".getBytes

  private def hex(dig: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HexDigits((dig(j) >> 4) & 0xF)
      out(2 * j + 1) = HexDigits(dig(j) & 0xF)
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(bytes: Array[Byte]): UTF8String = {
    val d = md5.get()
    d.reset()
    d.update(bytes, 0, bytes.length)
    hex(d.digest())
  }

  /** String input digests its UTF-8 bytes — identical to `md5(cast
    * (s as binary))`, which is what Spark's implicit cast does. */
  def computeUtf8(s: UTF8String): UTF8String = compute(s.getBytes)

  /** Column-API sugar for the registered function. */
  def fastMd5(c: Column): Column = call_function("graft_md5", c)
}
