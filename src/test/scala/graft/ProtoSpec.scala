package graft

import graft.sources.{EntityChanges, ProtoEntityChanges}
import graft.sources.ProtoEntityChanges.{PbChange, PbField, PbValue}
import org.apache.spark.sql.functions._

/** Gates for the protobuf EntityChanges wire codec (§2 reference-wire
  * surface): the encoder is pinned to HAND-DERIVED bytes (so the
  * round-trip gate is anchored to the wire spec, not self-consistent),
  * decode ∘ encode is identity on adversarial structures, unknown
  * fields skip losslessly, and the decoded stream maps onto the
  * repo's change model. */
class ProtoSpec extends SparkSpec {

  test("encoder matches hand-derived wire bytes") {
    // EntityChanges{ entity_changes(5): EntityChange{ entity(1)="Foo",
    //   id(2)="1", operation(4)=CREATE(1),
    //   fields(5)=[Field{ name(1)="d", new_value(3)=Value{string(4)="x" }}]}}
    // tags: field<<3|wiretype; strings are wt2 length-delimited.
    val want = Array(
      0x2A, 0x14, // EntityChanges.entity_changes, len 20
      0x0A, 0x03, 'F', 'o', 'o', // entity
      0x12, 0x01, '1', // id
      0x20, 0x01, // operation = CREATE
      0x2A, 0x08, // fields[0], len 8
      0x0A, 0x01, 'd', // name
      0x1A, 0x03, 0x22, 0x01, 'x' // new_value = Value{string="x"}
    ).map(_.toByte)
    val got = ProtoEntityChanges.encode(Seq(PbChange("Foo", "1", 0L,
      "OPERATION_CREATE", Seq(PbField("d", Some(PbValue("String", "x")))))))
    assert(got.toSeq === want.toSeq)
  }

  /** Adversarial payload: every Typed variant, negative int32 (10-byte
    * sign-extended varint), unicode, empty strings, base64 bytes,
    * arrays, ordinal, FINAL op, old_value, multiple changes. */
  private val adversarial: Seq[PbChange] = Seq(
    PbChange("Poi", "mainnet", 7L, "OPERATION_UPDATE", Seq(
      PbField("digest", Some(PbValue("Bytes",
        java.util.Base64.getEncoder.encodeToString(Array[Byte](0, -1, 127))))),
      PbField("n", Some(PbValue("Int32", "-2147483648"))),
      PbField("big", Some(PbValue("Bigint", "123456789012345678901234567890"))),
      PbField("dec", Some(PbValue("Bigdecimal", "-0.000000000001"))),
      PbField("ok", Some(PbValue("Bool", "true")), Some(PbValue("Bool", "false"))),
      PbField("emptied", Some(PbValue("String", ""))),
      PbField("uni", Some(PbValue("String", "üñïçødé 😀"))),
      PbField("tags", Some(PbValue("Array", null, Seq(
        PbValue("String", "a"), PbValue("String", "b,c\\d"))))),
      PbField("nums", Some(PbValue("Array", null, Seq(
        PbValue("Bigint", "1"), PbValue("Bigint", "-2"))))))),
    PbChange("Empty", "", 0L, "OPERATION_UNSPECIFIED", Nil),
    PbChange("Fin", "z", 1L, "OPERATION_FINAL", Seq(PbField("f", None))))

  test("decode ∘ encode is identity on adversarial structures") {
    val bytes = ProtoEntityChanges.encode(adversarial)
    assert(ProtoEntityChanges.decode(bytes) === adversarial)
  }

  test("malformed payloads fail loudly, never decode to garbage") {
    val good = ProtoEntityChanges.encode(adversarial.take(1))
    // truncated mid-message, truncated mid-varint, and a
    // length-delimited field whose declared length overruns the buffer
    intercept[Exception](ProtoEntityChanges.decode(good.dropRight(3)))
    intercept[Exception](ProtoEntityChanges.decode(Array(0x2A, 0xFF).map(_.toByte)))
    intercept[Exception](ProtoEntityChanges.decode(Array(0x2A, 0x7F, 0x0A).map(_.toByte)))
    // empty payload is a VALID empty EntityChanges message
    assert(ProtoEntityChanges.decode(Array.empty[Byte]) === Nil)
  }

  test("unknown fields and wire types skip losslessly") {
    // splice unknown fields at the EntityChanges level (fixed64 wt1,
    // fixed32 wt5, varint wt0, length-delimited wt2 with field numbers
    // the descriptor doesn't use) around a real change
    val real = ProtoEntityChanges.encode(adversarial.take(1))
    val noise1 = Array(0x59, 1, 2, 3, 4, 5, 6, 7, 8).map(_.toByte) // field 11, wt1
    val noise2 = Array(0x78, 0x96, 0x01).map(_.toByte) // field 15, wt0 varint 150
    val noise3 = Array(0x65, 9, 9, 9, 9).map(_.toByte) // field 12, wt5
    val noise4 = Array(0x3A, 0x02, 0x68, 0x69).map(_.toByte) // field 7, wt2 "hi"
    val spliced = noise1 ++ noise2 ++ real ++ noise3 ++ noise4
    assert(ProtoEntityChanges.decode(spliced) === adversarial.take(1))
  }

  test("live-sink path end-to-end: streamed proto payloads -> decode -> squash == batch SCD2") {
    // the reference `run` loop as one flow: per-block EntityChanges
    // payloads arrive on a stream, decode map-only through the
    // expression, fan out to changes, and the streaming squash closes
    // versions — which must equal batch SCD2 over the same chain
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EntityChangeStream
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val chain = Seq( // (id, block, op, value)
      ("e1", 1L, "CREATE", 1.0), ("e2", 2L, "CREATE", 2.0),
      ("e1", 3L, "UPDATE", 1.5), ("e2", 4L, "DELETE", 0.0),
      ("e1", 5L, "UPDATE", 1.9), ("e3", 5L, "CREATE", 3.0))
    val opCode = Map("CREATE" -> "OPERATION_CREATE",
      "UPDATE" -> "OPERATION_UPDATE", "DELETE" -> "OPERATION_DELETE")
    val payloads = chain.groupBy(_._2).toSeq.map { case (block, rows) =>
      (block, ProtoEntityChanges.encode(rows.map { case (id, _, op, v) =>
        PbChange("Event", id, 0L, opCode(op),
          Seq(PbField("value", Some(PbValue("Bigdecimal", v.toString)))))
      }))
    }
    val input = MemoryStream[(Long, Array[Byte])]
    val changes = input.toDF().toDF("block_num", "payload")
      .select(col("block_num"),
        explode(call_function("graft_entity_changes", col("payload"))).as("c"))
      .select(col("c.id").as("id"), col("block_num").as("blockNum"),
        when(col("c.op") === "OPERATION_CREATE", "CREATE")
          .when(col("c.op") === "OPERATION_DELETE", "DELETE")
          .otherwise("UPDATE").as("op"),
        col("c.fields").getItem(0).getField("value").cast("double").as("value"))
      .as[EntityChangeStream.Change]
    val q = EntityChangeStream.closedVersions(changes)
      .writeStream.format("memory").queryName("proto_versions")
      .outputMode("append").start()
    try {
      payloads.sortBy(_._1).grouped(2).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = spark.table("proto_versions").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val want = graft.operators.EntityVersioner.scd2Versions(
          chain.toDF("id", "block_num", "op", "value"))
        .filter(col("end_block").isNotNull).collect()
        .map(r => (r.getAs[String]("id"), r.getAs[Long]("start_block"),
          r.getAs[Long]("end_block"), r.getAs[Double]("value"))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("the expression decodes block payloads onto the change model") {
    import spark.implicits._
    graft.plans.GraftExtensions.ensureRegistered(spark)
    // derive per-block payloads FROM the change model (§3): one
    // EntityChanges message per block, value/props as typed fields —
    // then decode through the EXPRESSION and reconstruct the model
    val model = EntityChanges.changes(spark, sf).collect()
      .map(r => (r.getAs[String]("id"), r.getAs[Long]("block_num"),
        r.getAs[String]("op"), r.getAs[Double]("value"),
        r.getAs[String]("props")))
    val opCode = Map("CREATE" -> "OPERATION_CREATE",
      "UPDATE" -> "OPERATION_UPDATE", "DELETE" -> "OPERATION_DELETE")
    val payloads = model.groupBy(_._2).toSeq.map { case (block, rows) =>
      (block, ProtoEntityChanges.encode(rows.sortBy(_._1).map { case (id, _, op, v, props) =>
        PbChange("Event", id, 0L, opCode(op), Seq(
          PbField("value", Some(PbValue("Bigdecimal", v.toString))),
          PbField("props", Some(PbValue("String", props)))))
      }.toSeq))
    }
    val decoded = payloads.toDF("block_num", "payload")
      .select(col("block_num"),
        explode(call_function("graft_entity_changes", col("payload"))).as("c"))
      .select(col("c.id"), col("block_num"), col("c.op"),
        col("c.fields").getItem(0).getField("value").as("value"),
        col("c.fields").getItem(1).getField("value").as("props"),
        col("c.entity"), col("c.fields").getItem(0).getField("vtype").as("vt"))
      .collect()
    assert(decoded.forall(_.getAs[String]("entity") === "Event"))
    assert(decoded.forall(_.getAs[String]("vt") === "Bigdecimal"))
    val got = decoded.map(r => (r.getAs[String]("id"), r.getAs[Long]("block_num"),
      r.getAs[String]("op") match {
        case "OPERATION_CREATE" => "CREATE"
        case "OPERATION_UPDATE" => "UPDATE"
        case "OPERATION_DELETE" => "DELETE"
      }, r.getAs[String]("value").toDouble, r.getAs[String]("props"))).toSet
    assert(got === model.toSet)
    assert(got.nonEmpty)
  }

  test("encode expression round-trips every Typed variant distributed, arrays included") {
    import spark.implicits._
    graft.plans.GraftExtensions.ensureRegistered(spark)
    // Build change rows covering the variants the gl_proto_parse query
    // does NOT exercise (Array, Int32, Bool, Bytes, negative int32),
    // run them through graft_entity_changes_encode on EXECUTORS, decode
    // with graft_entity_changes, and demand the flattened view is
    // byte-for-byte what the driver-side codec produces.
    val changes = adversarial.take(1) // Poi change: all variants incl. arrays
    val rows = changes.map { c =>
      (c.entity, c.id, c.ordinal, c.op, c.fields.map { f =>
        val v = f.newValue.get
        val arr = if (v.vtype == "Array")
          v.array.map(e => (e.vtype, e.value)) else null
        (f.name, v.vtype, v.value, arr)
      })
    }
    val df = rows.toDF("entity", "id", "ordinal", "op", "fields")
      .select(call_function("graft_entity_changes_encode",
        array(struct(col("entity"), col("id"), col("ordinal"), col("op"),
          col("fields")))).as("payload"))
    val got = df.collect().head.getAs[Array[Byte]]("payload")
    // old_value is not carried by the expression's field schema — the
    // driver-side twin must drop it for byte equality
    val noOld = changes.map(c => c.copy(fields = c.fields.map(_.copy(oldValue = None))))
    assert(got.toSeq === ProtoEntityChanges.encode(noOld).toSeq)
    // and the decode expression inverts it on the executor too
    val back = df.select(explode(call_function("graft_entity_changes", col("payload"))).as("c"))
      .select(col("c.entity"), size(col("c.fields")).as("nf")).collect().head
    assert(back.getAs[String]("entity") === "Poi")
    assert(back.getAs[Int]("nf") === changes.head.fields.size)
  }

  test("encode expression rejects null mandatory columns with a clean error, not an NPE") {
    // the function is registered session-wide — arbitrary SQL callers
    // can hand it rows the gl_proto_parse pipeline's filters never
    // produce; each mandatory-null shape must surface as a named
    // IllegalArgumentException, not an opaque executor NPE
    graft.plans.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    def encodeOf(entity: String, id: String, op: String,
                 fields: Seq[(String, String, String)]) =
      Seq((entity, id, 1L, op, fields)).toDF("entity", "id", "ordinal", "op", "fields")
        .select(call_function("graft_entity_changes_encode",
          array(struct(col("entity"), col("id"), col("ordinal"), col("op"),
            col("fields")))).as("payload"))
    def failure(df: org.apache.spark.sql.DataFrame): String = {
      val e = intercept[Exception](df.collect())
      // unwrap Spark's task-failure wrappers down to the root message
      var t: Throwable = e
      while (t.getCause != null && !t.isInstanceOf[IllegalArgumentException])
        t = t.getCause
      assert(t.isInstanceOf[IllegalArgumentException],
        s"expected IllegalArgumentException, got $e")
      t.getMessage
    }
    assert(failure(encodeOf(null, "x", "OPERATION_CREATE", Seq.empty))
      .contains("'entity'"))
    assert(failure(encodeOf("Poi", null, "OPERATION_CREATE", Seq.empty))
      .contains("'id'"))
    assert(failure(encodeOf("Poi", "x", null, Seq.empty))
      .contains("'op'"))
    assert(failure(encodeOf("Poi", "x", "OPERATION_CREATE",
      Seq((null, "String", "v")))).contains("name"))
    assert(failure(encodeOf("Poi", "x", "OPERATION_CREATE",
      Seq(("f", "String", null)))).contains("null value"))
    // a null fields ARRAY is a change with no typed fields — same
    // bytes as an empty one, not an error
    val nullFields = Seq(("Poi", "x", 1L, "OPERATION_CREATE"))
      .toDF("entity", "id", "ordinal", "op")
      .select(call_function("graft_entity_changes_encode",
        array(struct(col("entity"), col("id"), col("ordinal"), col("op"),
          lit(null).cast("array<struct<name:string,vtype:string,value:string>>")
            .as("fields")))).as("payload"))
      .collect().head.getAs[Array[Byte]]("payload")
    val emptyFields = encodeOf("Poi", "x", "OPERATION_CREATE",
      Seq.empty[(String, String, String)]).collect().head.getAs[Array[Byte]]("payload")
    assert(nullFields.toSeq === emptyFields.toSeq)
  }
}
