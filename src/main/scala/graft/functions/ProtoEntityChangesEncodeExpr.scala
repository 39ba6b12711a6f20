package graft.functions

import graft.sources.ProtoEntityChanges
import graft.sources.ProtoEntityChanges.{PbChange, PbField, PbValue}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

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
  * form is enforced by the shared encoder (field-number order,
  * defaults omitted — [[ProtoEntityChanges.encode]]), so
  * encode ∘ decode is identity and byte-stable — the property the
  * gl_proto_parse oracle gate rides on.
  */
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

  private def toValue(vtype: String, value: String, arr: ArrayData): PbValue =
    if (vtype == "Array" && arr != null) {
      val elems = (0 until arr.numElements()).map { i =>
        val e = arr.getStruct(i, 2)
        PbValue(e.getUTF8String(0).toString,
          if (e.isNullAt(1)) null else e.getUTF8String(1).toString)
      }
      PbValue("Array", null, elems)
    } else PbValue(vtype, value)

  /** Mandatory-column accessor: a clean IllegalArgumentException naming
    * the offending column beats the opaque executor NPE a raw
    * `getUTF8String(n).toString` throws — the function is registered
    * session-wide, so arbitrary SQL callers can hand it rows the
    * gl_proto_parse pipeline's own filters never produce. */
  private def reqStr(r: InternalRow, ord: Int, col: String, i: Int): String = {
    if (r.isNullAt(ord)) throw new IllegalArgumentException(
      s"graft_entity_changes_encode: null '$col' in change #$i — " +
        "entity, id, ordinal, and op are mandatory")
    r.getUTF8String(ord).toString
  }

  def compute(input: ArrayData): Array[Byte] = {
    val width = fieldStructWidth
    val changes = (0 until input.numElements()).map { i =>
      if (input.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_entity_changes_encode: null change struct at #$i")
      val c = input.getStruct(i, 5)
      if (c.isNullAt(2)) throw new IllegalArgumentException(
        s"graft_entity_changes_encode: null 'ordinal' in change #$i — " +
          "entity, id, ordinal, and op are mandatory")
      // a null fields ARRAY is a change with no typed fields (the
      // decode side emits an empty array; both encode identically)
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
