package graft.functions

import graft.sources.ProtoEntityChanges
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_entity_changes(binary)` — decode one protobuf
  * `EntityChanges` block payload ([[ProtoEntityChanges]]) into typed
  * rows, map-only: a change stream parses inside the scan's
  * whole-stage codegen, no UDF, no shuffle. Scalar values arrive as
  * (Typed-variant, string rendering) pairs — the same view the
  * reference's consumer switches on (csvprocessor/entity.go:116) —
  * and array values as an element list of the same pairs (graph-node
  * schemas only array over scalars; a nested array value would decode
  * as variant "Array" with a null rendering).
  *
  * The hot path ([[compute]]) parses the wire bytes DIRECTLY into
  * Catalyst containers, emitting `UTF8String.fromBytes` slices of the
  * payload — proto string fields are already UTF-8, so the
  * model-based path's bytes → java.lang.String (UTF-16) →
  * UTF8String (UTF-8 again) double conversion and its per-message
  * case-class/Option/builder allocations are pure overhead (round 12
  * measured the codec, not the surrounding plan, as gl_proto_parse's
  * dominant per-row cost). [[computeViaModel]] keeps the readable
  * [[ProtoEntityChanges.decode]]-based construction as the spec twin:
  * ProtoFusedSpec pins fused == model on the adversarial fixture
  * battery (unknown fields/wire types, arrays, unset, negative int32).
  */
case class ProtoEntityChangesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_entity_changes expects binary, got ${t.simpleString}")
    }

  override def dataType: DataType = ProtoEntityChangesExpr.schema

  import ProtoEntityChangesExpr._
  import ProtoEntityChanges.Reader

  /** (vtype, value) of one Value submessage; last occurrence wins and
    * an empty submessage is the Unset variant — exactly
    * [[ProtoEntityChanges.decodeValue]]. Array elements recurse one
    * level with their own (vtype, value) pairs (nested arrays render
    * as ("Array", null), the model twin's behavior). */
  private def decodeValueSlice(r: Reader): (UTF8String, UTF8String, GenericArrayData) = {
    var vt: UTF8String = null; var vv: UTF8String = null
    var arr: GenericArrayData = null
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 0) =>
          vt = Int32U; vv = UTF8String.fromString(r.varint().toInt.toString); arr = null
        case (2, 2) => vt = BigdecimalU; vv = utf8(r); arr = null
        case (3, 2) => vt = BigintU; vv = utf8(r); arr = null
        case (4, 2) => vt = StringU; vv = utf8(r); arr = null
        case (5, 2) => vt = BytesU; vv = utf8(r); arr = null
        case (6, 0) =>
          vt = BoolU; vv = if (r.varint() != 0) TrueU else FalseU; arr = null
        case (10, 2) =>
          val (s, e) = r.lenDelim()
          val inner = new Reader(r.buf, s, e)
          val elems = scala.collection.mutable.ArrayBuffer.empty[Any]
          while (inner.hasMore) {
            val t2 = inner.varint()
            if ((t2 >> 3).toInt == 1 && (t2 & 7).toInt == 2) {
              val (s2, e2) = inner.lenDelim()
              val (et, ev, _) = decodeValueSlice(new Reader(inner.buf, s2, e2))
              elems += new GenericInternalRow(Array[Any](et, ev))
            } else inner.skip((t2 & 7).toInt)
          }
          vt = ArrayU; vv = null; arr = new GenericArrayData(elems.toArray)
        case (_, wt) => r.skip(wt)
      }
    }
    if (vt == null) (UnsetU, null, null) else (vt, vv, arr)
  }

  private def utf8(r: Reader): UTF8String = {
    val (s, e) = r.lenDelim()
    UTF8String.fromBytes(r.buf, s, e - s)
  }

  private def decodeFieldRow(r: Reader): GenericInternalRow = {
    var name: UTF8String = EmptyU
    var vt: UTF8String = null; var vv: UTF8String = null
    var arr: GenericArrayData = null; var seen = false
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => name = utf8(r)
        case (3, 2) =>
          val (s, e) = r.lenDelim()
          val (t, v, a) = decodeValueSlice(new Reader(r.buf, s, e))
          vt = t; vv = v; arr = a; seen = true
        case (5, 2) => // old_value: parsed (malformed bytes still refuse), never surfaced — as the model twin
          val (s, e) = r.lenDelim()
          decodeValueSlice(new Reader(r.buf, s, e)): Unit
        case (_, wt) => r.skip(wt)
      }
    }
    // no new_value submessage at all → (null, null, null), the model
    // twin's valueRow(None); arr only survives for the Array variant
    if (!seen) { vt = null; vv = null; arr = null }
    new GenericInternalRow(Array[Any](name, vt, vv, arr))
  }

  private def decodeChangeRow(r: Reader): GenericInternalRow = {
    var entity: UTF8String = EmptyU; var id: UTF8String = EmptyU
    var ordinal = 0L; var op = 0
    val fields = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => entity = utf8(r)
        case (2, 2) => id = utf8(r)
        case (3, 0) => ordinal = r.varint()
        case (4, 0) => op = r.varint().toInt
        case (5, 2) =>
          val (s, e) = r.lenDelim()
          fields += decodeFieldRow(new Reader(r.buf, s, e))
        case (_, wt) => r.skip(wt)
      }
    }
    val opU =
      if (op >= 0 && op < OpNamesU.length) OpNamesU(op)
      else UTF8String.fromString(s"OPERATION_$op")
    new GenericInternalRow(Array[Any](
      entity, id, ordinal, opU, new GenericArrayData(fields.toArray)))
  }

  def compute(bytes: Array[Byte]): GenericArrayData = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag >> 3).toInt == 5 && (tag & 7).toInt == 2) {
        val (s, e) = r.lenDelim()
        out += decodeChangeRow(new Reader(bytes, s, e))
      } else r.skip((tag & 7).toInt)
    }
    new GenericArrayData(out.toArray)
  }

  /** The original decode-to-model-then-convert path — retained verbatim
    * as ProtoFusedSpec's equality twin for [[compute]]. */
  private[graft] def computeViaModel(bytes: Array[Byte]): GenericArrayData = {
    val changes = ProtoEntityChanges.decode(bytes)
    def valueRow(v: ProtoEntityChanges.PbValue): (UTF8String, UTF8String) =
      (UTF8String.fromString(v.vtype),
        if (v.value == null) null else UTF8String.fromString(v.value))
    new GenericArrayData(changes.map { c =>
      val fields = new GenericArrayData(c.fields.map { f =>
        val (vt, vv) = f.newValue.map(valueRow)
          .getOrElse((null: UTF8String, null: UTF8String))
        val arr = f.newValue match {
          case Some(v) if v.vtype == "Array" =>
            new GenericArrayData(v.array.map { e =>
              val (et, ev) = valueRow(e)
              new GenericInternalRow(Array[Any](et, ev))
            }.toArray[Any])
          case _ => null
        }
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(f.name), vt, vv, arr))
      }.toArray[Any])
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(c.entity), UTF8String.fromString(c.id),
        c.ordinal, UTF8String.fromString(c.op), fields))
    }.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoDecode", this,
      classOf[ProtoEntityChangesExpr].getName)
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = $ref.compute($b);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ProtoEntityChangesExpr = copy(child = newChild)

  override def prettyName: String = "graft_entity_changes"
}

object ProtoEntityChangesExpr {
  val valueSchema: StructType = StructType(Seq(
    StructField("vtype", StringType), StructField("value", StringType)))
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("entity", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("ordinal", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("fields", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("vtype", StringType),
      StructField("value", StringType),
      StructField("arr", ArrayType(valueSchema)))))))))

  // interned variant/enum constants — the fused decoder emits these
  // instead of allocating a fresh UTF8String per row
  private[graft] val EmptyU = UTF8String.fromString("")
  private[graft] val Int32U = UTF8String.fromString("Int32")
  private[graft] val BigdecimalU = UTF8String.fromString("Bigdecimal")
  private[graft] val BigintU = UTF8String.fromString("Bigint")
  private[graft] val StringU = UTF8String.fromString("String")
  private[graft] val BytesU = UTF8String.fromString("Bytes")
  private[graft] val BoolU = UTF8String.fromString("Bool")
  private[graft] val ArrayU = UTF8String.fromString("Array")
  private[graft] val UnsetU = UTF8String.fromString("Unset")
  private[graft] val TrueU = UTF8String.fromString("true")
  private[graft] val FalseU = UTF8String.fromString("false")
  /** OPERATION_* names indexed by enum code ([[ProtoEntityChanges.OpNames]]). */
  private[graft] val OpNamesU: Array[UTF8String] =
    (0 to 4).map(i => UTF8String.fromString(ProtoEntityChanges.OpNames(i))).toArray
}
