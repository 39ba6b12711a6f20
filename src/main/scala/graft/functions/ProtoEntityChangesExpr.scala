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
  */
case class ProtoEntityChangesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_entity_changes expects binary, got ${t.simpleString}")
    }

  override def dataType: DataType = ProtoEntityChangesExpr.schema

  def compute(bytes: Array[Byte]): GenericArrayData = {
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
}
