package graft.functions

import graft.sources.ProtoEntityChanges
import graft.sources.ProtoEntityChanges.{PbChange, PbField, PbValue}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `graft_entity_changes_encode(array<struct>)` — the WRITE direction
  * of [[ProtoEntityChangesExpr]]: serialize one block's change list to
  * a canonical `sf.substreams.sink.entity.v1.EntityChanges` protobuf
  * payload (the byte layout `run` unmarshals per block, reference
  * sinker/sinker.go:213-214). Together the pair make the wire format a
  * first-class storage codec: a sink writes payloads at scan speed and
  * the decode side reads them back, both map-only inside whole-stage
  * codegen, no proto runtime, no UDF.
  *
  * Input shape (positional): `array<struct<entity:string, id:string,
  * ordinal:long, op:string, fields:array<struct<name:string,
  * vtype:string, value:string [, arr:array<struct<vtype,value>>]>>>>`
  * — exactly the decode output schema, with the trailing `arr` column
  * optional so query builders can pass scalar-only field structs.
  * `op` takes the enum NAMES the decoder emits
  * (`OPERATION_CREATE` …, sinker/sinker.go:278-284); proto3 canonical
  * form is enforced (field-number order, defaults omitted), so
  * encode ∘ decode is identity and byte-stable — the property the
  * gl_proto_parse oracle gate rides on.
  *
  * The hot path ([[compute]]) sizes each submessage arithmetically
  * from `UTF8String.numBytes` (proto strings ARE UTF-8 — no UTF-16
  * round trip) and writes the payload in one pass into one exact-size
  * array: the model-based path allocated a ByteArrayOutputStream per
  * nesting level (6 per single-change message) and re-copied the bytes
  * at every level. [[computeViaModel]] keeps that readable
  * [[ProtoEntityChanges.encode]] construction as the spec twin;
  * ProtoFusedSpec pins fused bytes == model bytes across the
  * adversarial fixture battery. Validation (messages and order) is
  * unchanged: per-change mandatory-column checks first, then variant
  * dispatch errors in change order — exactly the model path's
  * build-then-encode sequencing. */
case class ProtoEntityChangesEncodeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _) if st.length == 5 =>
        (st(4).dataType: @unchecked) match {
          case ArrayType(ft: StructType, _) if ft.length == 3 || ft.length == 4 =>
            TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "graft_entity_changes_encode: fields column must be array<struct<name,vtype,value[,arr]>>")
        }
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_entity_changes_encode expects array<struct<entity,id,ordinal,op,fields>>, got ${t.simpleString}")
    }

  override def dataType: DataType = BinaryType

  private lazy val fieldStructWidth: Int =
    child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType](4)
      .dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].length

  import ProtoEntityChangesExpr._

  /** Mandatory-column accessor: a clean IllegalArgumentException naming
    * the offending column beats the opaque executor NPE a raw
    * `getUTF8String(n)` would eventually throw — the function is
    * registered session-wide, so arbitrary SQL callers can hand it rows
    * the gl_proto_parse pipeline's own filters never produce. */
  private def reqU(r: InternalRow, ord: Int, col: String, i: Int): UTF8String = {
    if (r.isNullAt(ord)) throw new IllegalArgumentException(
      s"graft_entity_changes_encode: null '$col' in change #$i — " +
        "entity, id, ordinal, and op are mandatory")
    r.getUTF8String(ord)
  }

  /** Validation pass — the same checks, messages, and ORDER as the
    * model path's PbChange construction (which validated every change
    * before any wire byte was produced). */
  private def validate(input: ArrayData, width: Int): Unit = {
    var i = 0
    while (i < input.numElements()) {
      if (input.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_entity_changes_encode: null change struct at #$i")
      val c = input.getStruct(i, 5)
      if (c.isNullAt(2)) throw new IllegalArgumentException(
        s"graft_entity_changes_encode: null 'ordinal' in change #$i — " +
          "entity, id, ordinal, and op are mandatory")
      val fa = if (c.isNullAt(4)) null else c.getArray(4)
      val n = if (fa == null) 0 else fa.numElements()
      var j = 0
      while (j < n) {
        if (fa.isNullAt(j)) throw new IllegalArgumentException(
          s"graft_entity_changes_encode: null field struct at change #$i field #$j")
        val f = fa.getStruct(j, width)
        val vt = if (f.isNullAt(1)) null else f.getUTF8String(1)
        if (vt != null && !vt.equals(ArrayU) && !vt.equals(UnsetU) && f.isNullAt(2))
          throw new IllegalArgumentException(
            s"graft_entity_changes_encode: field '${reqU(f, 0, "name", i)}' " +
              s"in change #$i has vtype '$vt' but a null value")
        reqU(f, 0, "name", i): Unit
        j += 1
      }
      reqU(c, 0, "entity", i); reqU(c, 1, "id", i); reqU(c, 3, "op", i)
      i += 1
    }
  }

  private def varintLen(v: Long): Int = {
    var n = 1; var x = v
    while ((x & ~0x7fL) != 0) { n += 1; x >>>= 7 }
    n
  }

  /** Wire length of one Value submessage's contents. `arr` is non-null
    * only for a top-level Array variant with a present element list —
    * the model path's `toValue` shape (an Array variant with a null
    * list still emits the empty `Array{}` submessage). */
  private def valueLen(vt: UTF8String, vv: UTF8String, arr: ArrayData): Int =
    if (vt.equals(ArrayU)) {
      var inner = 0
      val n = if (arr == null) 0 else arr.numElements()
      var k = 0
      while (k < n) {
        val e = arr.getStruct(k, 2)
        val el = valueLen(e.getUTF8String(0),
          if (e.isNullAt(1)) null else e.getUTF8String(1), null)
        inner += 1 + varintLen(el.toLong) + el
        k += 1
      }
      1 + varintLen(inner.toLong) + inner
    } else if (vt.equals(Int32U)) 1 + varintLen(vv.toString.toInt.toLong)
    else if (vt.equals(BigdecimalU) || vt.equals(BigintU) ||
      vt.equals(StringU) || vt.equals(BytesU)) {
      val n = vv.numBytes; 1 + varintLen(n.toLong) + n
    } else if (vt.equals(BoolU)) 2
    else if (vt.equals(UnsetU)) 0
    else throw new IllegalArgumentException(s"unknown Typed variant $vt")

  private def fieldLen(f: InternalRow, width: Int): Int = {
    val name = f.getUTF8String(0)
    var len = 1 + varintLen(name.numBytes.toLong) + name.numBytes
    if (!f.isNullAt(1)) {
      val vl = valueLen(f.getUTF8String(1),
        if (f.isNullAt(2)) null else f.getUTF8String(2),
        if (width == 4 && !f.isNullAt(3)) f.getArray(3) else null)
      len += 1 + varintLen(vl.toLong) + vl
    }
    len
  }

  private def opCode(op: UTF8String): Int = {
    var k = 1
    while (k < OpNamesU.length) { if (op.equals(OpNamesU(k))) return k; k += 1 }
    0 // unknown names encode as the omitted default, as opCodes.getOrElse(_, 0)
  }

  private def changeLen(c: InternalRow, width: Int): Int = {
    val en = c.getUTF8String(0).numBytes; val idn = c.getUTF8String(1).numBytes
    var len = (1 + varintLen(en.toLong) + en) + (1 + varintLen(idn.toLong) + idn)
    val ord = c.getLong(2)
    if (ord != 0) len += 1 + varintLen(ord)
    val op = opCode(c.getUTF8String(3))
    if (op != 0) len += 1 + varintLen(op.toLong)
    val fa = if (c.isNullAt(4)) null else c.getArray(4)
    val n = if (fa == null) 0 else fa.numElements()
    var j = 0
    while (j < n) {
      val fl = fieldLen(fa.getStruct(j, width), width)
      len += 1 + varintLen(fl.toLong) + fl
      j += 1
    }
    len
  }

  /** Single-pass wire writer over a pre-sized array. */
  private final class Sink(val buf: Array[Byte]) {
    var pos = 0
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { buf(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1; v >>>= 7 }
      buf(pos) = v.toByte; pos += 1
    }
    def tag(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
    def utf8(field: Int, s: UTF8String): Unit = {
      tag(field, 2); varint(s.numBytes.toLong)
      s.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + pos)
      pos += s.numBytes
    }
  }

  private def writeValue(w: Sink, vt: UTF8String, vv: UTF8String, arr: ArrayData): Unit =
    if (vt.equals(ArrayU)) {
      var inner = 0
      val n = if (arr == null) 0 else arr.numElements()
      var k = 0
      while (k < n) {
        val e = arr.getStruct(k, 2)
        val el = valueLen(e.getUTF8String(0),
          if (e.isNullAt(1)) null else e.getUTF8String(1), null)
        inner += 1 + varintLen(el.toLong) + el
        k += 1
      }
      w.tag(10, 2); w.varint(inner.toLong)
      k = 0
      while (k < n) {
        val e = arr.getStruct(k, 2)
        val evt = e.getUTF8String(0)
        val evv = if (e.isNullAt(1)) null else e.getUTF8String(1)
        w.tag(1, 2); w.varint(valueLen(evt, evv, null).toLong)
        writeValue(w, evt, evv, null)
        k += 1
      }
    } else if (vt.equals(Int32U)) { w.tag(1, 0); w.varint(vv.toString.toInt.toLong) }
    else if (vt.equals(BigdecimalU)) w.utf8(2, vv)
    else if (vt.equals(BigintU)) w.utf8(3, vv)
    else if (vt.equals(StringU)) w.utf8(4, vv)
    else if (vt.equals(BytesU)) w.utf8(5, vv)
    else if (vt.equals(BoolU)) { w.tag(6, 0); w.varint(if (vv.equals(TrueU)) 1L else 0L) }
    else if (vt.equals(UnsetU)) ()
    else throw new IllegalArgumentException(s"unknown Typed variant $vt")

  def compute(input: ArrayData): Array[Byte] = {
    val width = fieldStructWidth
    validate(input, width)
    // size pass: variant-dispatch errors (unknown variant, non-numeric
    // Int32) surface here in change order, before any byte is written —
    // the model path's encode-walk sequencing
    var total = 0
    var i = 0
    while (i < input.numElements()) {
      val cl = changeLen(input.getStruct(i, 5), width)
      total += 1 + varintLen(cl.toLong) + cl
      i += 1
    }
    val w = new Sink(new Array[Byte](total))
    i = 0
    while (i < input.numElements()) {
      val c = input.getStruct(i, 5)
      w.tag(5, 2); w.varint(changeLen(c, width).toLong)
      w.utf8(1, c.getUTF8String(0)); w.utf8(2, c.getUTF8String(1))
      val ord = c.getLong(2)
      if (ord != 0) { w.tag(3, 0); w.varint(ord) }
      val op = opCode(c.getUTF8String(3))
      if (op != 0) { w.tag(4, 0); w.varint(op.toLong) }
      val fa = if (c.isNullAt(4)) null else c.getArray(4)
      val n = if (fa == null) 0 else fa.numElements()
      var j = 0
      while (j < n) {
        val f = fa.getStruct(j, width)
        w.tag(5, 2); w.varint(fieldLen(f, width).toLong)
        w.utf8(1, f.getUTF8String(0))
        if (!f.isNullAt(1)) {
          val vt = f.getUTF8String(1)
          val vv = if (f.isNullAt(2)) null else f.getUTF8String(2)
          val arr = if (width == 4 && !f.isNullAt(3)) f.getArray(3) else null
          w.tag(3, 2); w.varint(valueLen(vt, vv, arr).toLong)
          writeValue(w, vt, vv, arr)
        }
        j += 1
      }
      i += 1
    }
    // unconditional (NOT a Scala assert, which -Xdisable-assertions
    // elides): a sizing/writing mismatch must fail loudly, never emit
    // a silently corrupt payload (round-12 ADVICE)
    if (w.pos != total) throw new IllegalStateException(
      s"graft_entity_changes_encode: sized $total bytes, wrote ${w.pos}")
    w.buf
  }

  /** The original build-PbChange-then-encode path — retained verbatim
    * as ProtoFusedSpec's byte-equality twin for [[compute]]. */
  private[graft] def computeViaModel(input: ArrayData): Array[Byte] = {
    val width = fieldStructWidth
    def reqStr(r: InternalRow, ord: Int, col: String, i: Int): String = {
      if (r.isNullAt(ord)) throw new IllegalArgumentException(
        s"graft_entity_changes_encode: null '$col' in change #$i — " +
          "entity, id, ordinal, and op are mandatory")
      r.getUTF8String(ord).toString
    }
    def toValue(vtype: String, value: String, arr: ArrayData): PbValue =
      if (vtype == "Array" && arr != null) {
        val elems = (0 until arr.numElements()).map { i =>
          val e = arr.getStruct(i, 2)
          PbValue(e.getUTF8String(0).toString,
            if (e.isNullAt(1)) null else e.getUTF8String(1).toString)
        }
        PbValue("Array", null, elems)
      } else PbValue(vtype, value)
    val changes = (0 until input.numElements()).map { i =>
      if (input.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_entity_changes_encode: null change struct at #$i")
      val c = input.getStruct(i, 5)
      if (c.isNullAt(2)) throw new IllegalArgumentException(
        s"graft_entity_changes_encode: null 'ordinal' in change #$i — " +
          "entity, id, ordinal, and op are mandatory")
      val fa = if (c.isNullAt(4)) null else c.getArray(4)
      val fields = (0 until (if (fa == null) 0 else fa.numElements())).map { j =>
        if (fa.isNullAt(j)) throw new IllegalArgumentException(
          s"graft_entity_changes_encode: null field struct at change #$i field #$j")
        val f = fa.getStruct(j, width)
        val vtype = if (f.isNullAt(1)) null else f.getUTF8String(1).toString
        val value = if (f.isNullAt(2)) null else f.getUTF8String(2).toString
        val arr = if (width == 4 && !f.isNullAt(3)) f.getArray(3) else null
        if (vtype != null && vtype != "Array" && vtype != "Unset" && value == null)
          throw new IllegalArgumentException(
            s"graft_entity_changes_encode: field '${reqStr(f, 0, "name", i)}' " +
              s"in change #$i has vtype '$vtype' but a null value")
        PbField(reqStr(f, 0, "name", i),
          if (vtype == null) None else Some(toValue(vtype, value, arr)))
      }
      PbChange(reqStr(c, 0, "entity", i), reqStr(c, 1, "id", i),
        c.getLong(2), reqStr(c, 3, "op", i), fields)
    }
    ProtoEntityChanges.encode(changes)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoEncode", this,
      classOf[ProtoEntityChangesEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = $ref.compute($b);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ProtoEntityChangesEncodeExpr = copy(child = newChild)

  override def prettyName: String = "graft_entity_changes_encode"
}
