package graft.functions

import graft.stablehash.StableHash
import graft.stablehash.StableHash.U192
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Final POI readoff for the distributed stablehash chain
  * ([[graft.operators.PoiStableHash.poiChain]]): given a block's
  * in-bundle prefix mixer `(v0, v1, v2, cnt)`, its bundle's chain
  * offset `(ov0, ov1, ov2, ocnt)`, and `has_off` (0 for the first
  * bundle, whose offset legs are zeros), emit
  * `hex(FastHasher.from(mix(offset, prefix), ocnt + cnt).toBytes)` —
  * exactly the Dataset.map closure it replaces, as a codegen'd
  * expression so the serve stays inside Tungsten rows (the typed map
  * paid a full InternalRow → case-class → InternalRow serde per block
  * row per pass; round 12, guide §1.2 per-task work). Bit-compat is
  * gated by the same PoiStableHashSparkSpec sequential-chain pin as
  * before. All nine legs are non-nullable longs by construction (the
  * serve inner-joins a COMPLETE per-bundle offset table). Registered
  * as `graft_poi_hex`. */
case class PoiHex(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 9)
      TypeCheckResult.TypeCheckFailure(
        "graft_poi_hex expects (v0, v1, v2, cnt, ov0, ov1, ov2, ocnt, has_off)")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure("graft_poi_hex expects 9 longs")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val v = children.map(_.eval(input).asInstanceOf[Long])
    PoiHex.compute(v(0), v(1), v(2), v(3), v(4), v(5), v(6), v(7), v(8))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val argv = evs.map(_.value.toString).mkString(", ")
    val childCode = evs.map(_.code.toString).mkString("\n")
    ev.copy(
      code = code"""
        $childCode
        UTF8String ${ev.value} = graft.functions.PoiHex.compute($argv);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PoiHex = copy(children = newChildren)

  override def prettyName: String = "graft_poi_hex"
}

object PoiHex {
  private val HexChars = "0123456789abcdef".toCharArray

  def compute(v0: Long, v1: Long, v2: Long, cnt: Long,
              ov0: Long, ov1: Long, ov2: Long, ocnt: Long,
              hasOff: Long): UTF8String = {
    val local = U192(v0, v1, v2)
    val (m, c) =
      if (hasOff == 0L) (local, cnt)
      else (StableHash.mix(U192(ov0, ov1, ov2), local), ocnt + cnt)
    val bytes = StableHash.FastHasher.from(m, c).toBytes
    val out = new Array[Byte](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4).toByte
      out(i * 2 + 1) = HexChars(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
