package graft

import graft.functions.{ProtoEntityChangesEncodeExpr, ProtoEntityChangesExpr}
import graft.sources.ProtoEntityChanges
import graft.sources.ProtoEntityChanges.{PbChange, PbField, PbValue}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Round-12 optimization gate: the proto expressions' FUSED byte-level
  * hot paths (wire bytes ⟷ Catalyst containers directly, UTF8String
  * slices, single-pass sized encode) must be indistinguishable from
  * the retained model-based twins (`computeViaModel` — the original
  * decode-to-PbChange / build-PbChange-then-encode constructions) on
  * the full adversarial battery: every Typed variant, arrays, negative
  * int32, unicode, empty strings, unknown fields and wire types,
  * unset values, unknown op names, the 3/4-column field struct, and
  * the smoke corpus' real change stream. Divergence classes this spec
  * exists to catch: UTF-8 slicing vs String round-trip, varint length
  * arithmetic vs ByteArrayOutputStream sizing, validation message or
  * order drift. */
class ProtoFusedSpec extends SparkSpec {

  private val adversarial: Seq[PbChange] = Seq(
    PbChange("Poi", "mainnet", 7L, "OPERATION_UPDATE", Seq(
      PbField("digest", Some(PbValue("Bytes",
        java.util.Base64.getEncoder.encodeToString(Array[Byte](0, -1, 127))))),
      PbField("n", Some(PbValue("Int32", "-2147483648"))),
      PbField("big", Some(PbValue("Bigint", "123456789012345678901234567890"))),
      PbField("dec", Some(PbValue("Bigdecimal", "-0.000000000001"))),
      PbField("ok", Some(PbValue("Bool", "true"))),
      PbField("no", Some(PbValue("Bool", "false"))),
      PbField("emptied", Some(PbValue("String", ""))),
      PbField("uni", Some(PbValue("String", "üñïçødé 😀"))),
      PbField("unset", Some(PbValue("Unset", null))),
      PbField("absent", None),
      PbField("tags", Some(PbValue("Array", null, Seq(
        PbValue("String", "a"), PbValue("String", "b,c\\d"))))),
      PbField("nums", Some(PbValue("Array", null, Seq(
        PbValue("Bigint", "1"), PbValue("Bigint", "-2"))))))),
    PbChange("Empty", "", 0L, "OPERATION_UNSPECIFIED", Nil),
    PbChange("Fin", "z", 1L, "OPERATION_FINAL", Seq(PbField("f", None))))

  // ---- decode: fused == model ---------------------------------------

  private val decodeExpr = ProtoEntityChangesExpr(Literal(null, BinaryType))
  private val toExternal =
    CatalystTypeConverters.createToScalaConverter(ProtoEntityChangesExpr.schema)

  private def decodeBoth(bytes: Array[Byte]): (Any, Any) =
    (toExternal(decodeExpr.compute(bytes)),
      toExternal(decodeExpr.computeViaModel(bytes)))

  test("decode: fused == model on the adversarial battery") {
    val (got, want) = decodeBoth(ProtoEntityChanges.encode(adversarial))
    assert(got === want)
  }

  test("decode: fused == model with unknown fields and wire types spliced in") {
    val real = ProtoEntityChanges.encode(adversarial.take(1))
    val noise1 = Array(0x59, 1, 2, 3, 4, 5, 6, 7, 8).map(_.toByte) // field 11, wt1
    val noise2 = Array(0x78, 0x96, 0x01).map(_.toByte) // field 15, wt0 varint 150
    val noise3 = Array(0x65, 9, 9, 9, 9).map(_.toByte) // field 12, wt5
    val noise4 = Array(0x3A, 0x02, 0x68, 0x69).map(_.toByte) // field 7, wt2 "hi"
    val (got, want) = decodeBoth(noise1 ++ noise2 ++ real ++ noise3 ++ noise4)
    assert(got === want)
    val (ge, we) = decodeBoth(Array.empty[Byte])
    assert(ge === we)
  }

  test("decode: fused refuses exactly where the model refuses") {
    val good = ProtoEntityChanges.encode(adversarial.take(1))
    for (bad <- Seq(good.dropRight(3),
        Array(0x2A, 0xFF).map(_.toByte),
        Array(0x2A, 0x7F, 0x0A).map(_.toByte))) {
      val e1 = intercept[Exception](decodeExpr.compute(bad))
      val e2 = intercept[Exception](decodeExpr.computeViaModel(bad))
      assert(e1.getClass === e2.getClass)
      assert(e1.getMessage === e2.getMessage)
    }
  }

  // ---- encode: fused == model ---------------------------------------

  private def encodeSchema(withArr: Boolean): DataType = {
    val fields = Seq(
      StructField("name", StringType), StructField("vtype", StringType),
      StructField("value", StringType)) ++
      (if (withArr) Seq(StructField("arr", ArrayType(StructType(Seq(
        StructField("vtype", StringType), StructField("value", StringType))))))
      else Nil)
    ArrayType(StructType(Seq(
      StructField("entity", StringType), StructField("id", StringType),
      StructField("ordinal", LongType), StructField("op", StringType),
      StructField("fields", ArrayType(StructType(fields))))))
  }

  private def encodeBoth(external: Seq[Any], withArr: Boolean): (Seq[Byte], Seq[Byte]) = {
    val schema = encodeSchema(withArr)
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val expr = ProtoEntityChangesEncodeExpr(Literal(null, schema))
    val arr = conv(external).asInstanceOf[ArrayData]
    (expr.compute(arr).toSeq, expr.computeViaModel(arr.copy()).toSeq)
  }

  private def externalOf(changes: Seq[PbChange]): Seq[Any] =
    changes.map { c =>
      org.apache.spark.sql.Row(c.entity, c.id, c.ordinal, c.op,
        c.fields.map { f =>
          val vt = f.newValue.map(_.vtype).orNull
          val vv = f.newValue.map(_.value).orNull
          val arr = f.newValue match {
            case Some(v) if v.vtype == "Array" =>
              v.array.map(e => org.apache.spark.sql.Row(e.vtype, e.value))
            case _ => null
          }
          org.apache.spark.sql.Row(f.name, vt, vv, arr)
        })
    }

  test("encode: fused == model on the adversarial battery (and == the reference codec)") {
    val (got, want) = encodeBoth(externalOf(adversarial), withArr = true)
    assert(got === want)
    // and both equal the driver-side reference codec's bytes
    assert(got === ProtoEntityChanges.encode(adversarial).toSeq)
  }

  test("encode: fused == model on the 3-column field struct (no arr leg)") {
    val external = adversarial.map { c =>
      val rows = c.fields.collect {
        case f if f.newValue.forall(_.vtype != "Array") =>
          org.apache.spark.sql.Row(f.name,
            f.newValue.map(_.vtype).orNull, f.newValue.map(_.value).orNull)
      }
      org.apache.spark.sql.Row(c.entity, c.id, c.ordinal, c.op, rows)
    }
    val (got, want) = encodeBoth(external, withArr = false)
    assert(got === want)
  }

  test("encode: fused == model on degenerate shapes") {
    // Array vtype with a NULL element list (encodes the empty Array{}),
    // unknown op name (encodes as the omitted default), ordinal 0
    val shapes = Seq(
      org.apache.spark.sql.Row("E", "1", 0L, "OPERATION_BOGUS", Seq(
        org.apache.spark.sql.Row("a", "Array", null, null))),
      org.apache.spark.sql.Row("", "", 0L, "OPERATION_UNSPECIFIED", Seq.empty))
    val (got, want) = encodeBoth(shapes, withArr = true)
    assert(got === want)
  }

  test("encode: fused errors match the model's messages") {
    val badVariant = Seq(org.apache.spark.sql.Row("E", "1", 1L, "OPERATION_CREATE",
      Seq(org.apache.spark.sql.Row("f", "Nope", "v", null))))
    val badInt = Seq(org.apache.spark.sql.Row("E", "1", 1L, "OPERATION_CREATE",
      Seq(org.apache.spark.sql.Row("f", "Int32", "xyz", null))))
    for (bad <- Seq(badVariant, badInt)) {
      val schema = encodeSchema(true)
      val conv = CatalystTypeConverters.createToCatalystConverter(schema)
      val expr = ProtoEntityChangesEncodeExpr(Literal(null, schema))
      val arr = conv(bad).asInstanceOf[ArrayData]
      val e1 = intercept[Exception](expr.compute(arr))
      val e2 = intercept[Exception](expr.computeViaModel(arr.copy()))
      assert(e1.getClass === e2.getClass)
      assert(e1.getMessage === e2.getMessage)
    }
  }

  test("invalid UTF-8 payload bytes: the fused path is byte-faithful BY DESIGN " +
    "(raw bytes preserved and round-tripped; the model twin sanitizes to U+FFFD)") {
    // round-12 ADVICE fixture: proto wire strings are length-delimited
    // byte runs — nothing in the format guarantees valid UTF-8. The
    // FUSED decode emits UTF8String.fromBytes slices (byte-faithful:
    // fused-encode ∘ fused-decode is the identity on any payload); the
    // retained MODEL twin round-trips through java.lang.String, which
    // replaces malformed sequences with U+FFFD and cannot round-trip.
    // The fused behavior is the PINNED contract — this fixture is the
    // one place the twins intentionally diverge, and it documents both
    // sides so neither can drift silently.
    import org.apache.spark.unsafe.types.UTF8String
    val rawEntity = Array(0xFF.toByte, 0xFE.toByte, 'A'.toByte) // not UTF-8
    val wire = Array[Byte](0x2A, 0x08, // change #0, len 8
      0x0A, 0x03, rawEntity(0), rawEntity(1), rawEntity(2), // entity
      0x12, 0x01, 0x7A) // id "z" (ordinal 0 / op 0 omitted by the codec)
    // fused decode preserves the exact payload bytes
    val got = decodeExpr.compute(wire)
    val row = got.getStruct(0, 5)
    assert(row.getUTF8String(0).getBytes.toSeq === rawEntity.toSeq)
    assert(row.getUTF8String(1).toString === "z")
    // ...and the fused encode of those rows reproduces the wire exactly
    val encExpr = ProtoEntityChangesEncodeExpr(Literal(null, encodeSchema(true)))
    val reEnc = encExpr.compute(ArrayData.toArrayData(Array[Any](
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromBytes(rawEntity), UTF8String.fromString("z"), 0L,
        UTF8String.fromString("OPERATION_UNSPECIFIED"),
        ArrayData.toArrayData(Array.empty[Any])))))
    assert(reEnc.toSeq === wire.toSeq)
    // the model twin sanitizes: U+FFFD U+FFFD 'A' — documented, not a bug
    val model = decodeExpr.computeViaModel(wire)
    val sanitized = new String(rawEntity, java.nio.charset.StandardCharsets.UTF_8)
    assert(sanitized.startsWith("�"))
    assert(model.getStruct(0, 5).getUTF8String(0).toString === sanitized)
  }

  test("decode ∘ fused-encode and fused-decode ∘ encode are identity on the smoke corpus") {
    // real change stream (sf smoke corpus) through BOTH fused
    // directions: encode each row's one-change message with the fused
    // expression path, decode with the fused expression path, and pin
    // the external view equal to the model-twin chain
    val model = graft.sources.EntityChanges.changes(spark, sf).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Long]("block_num"),
        r.getAs[String]("op"), r.getAs[Double]("value"),
        r.getAs[String]("props")))
    val changes = model.toSeq.map { case (id, block, op, v, props) =>
      PbChange("Event", id, block, s"OPERATION_$op", Seq(
        PbField("value", Some(PbValue("Bigdecimal", v.toString))),
        PbField("props", Some(PbValue("String", props)))))
    }
    val (gotBytes, wantBytes) = encodeBoth(externalOf(changes), withArr = true)
    assert(gotBytes === wantBytes)
    val (gotRows, wantRows) = decodeBoth(gotBytes.toArray)
    assert(gotRows === wantRows)
    assert(changes.nonEmpty)
  }
}
