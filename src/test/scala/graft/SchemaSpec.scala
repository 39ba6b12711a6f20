package graft

import graft.operators.CsvSerializer
import graft.sources.GraphqlSchema
import graft.sources.GraphqlSchema.FieldType

class SchemaSpec extends SparkSpec {

  private val sdl =
    """# comment line
      |type TokenDayData @entity {
      |  id: ID!
      |  dailyVolumeUSD: BigDecimal!
      |  txCount: BigInt
      |  raw: Bytes
      |  tags: [String!]!
      |  owners: [Account!]! @derivedFrom(field: "token")
      |  active: Boolean!
      |}
      |type Transfer @entity(immutable: true) {
      |  id: ID!
      |  amount: BigInt!
      |}
      |type NotAnEntity {
      |  id: ID!
      |}""".stripMargin

  test("graphql parse: entities, types, wrappers, derivedFrom skip, immutable") {
    val ents = GraphqlSchema.parse(sdl)
    assert(ents.map(_.name) === Seq("token_day_data", "transfer"))

    val tdd = ents.head
    assert(!tdd.immutable)
    assert(!tdd.fields.contains("owners"), "@derivedFrom fields must be skipped")
    assert(tdd.fields("daily_volume_usd").fieldType === FieldType.BigDecimal)
    assert(!tdd.fields("daily_volume_usd").nullable)
    assert(tdd.fields("tx_count").nullable)
    assert(tdd.fields("raw").fieldType === FieldType.Bytes)
    val tags = tdd.fields("tags")
    assert(tags.array && !tags.nullable) // element non-null drives nullability
    assert(tdd.fields("active").fieldType === FieldType.Bool)

    val tr = ents(1)
    assert(tr.immutable)
    assert(tr.fields("amount").fieldType === FieldType.BigInt)
  }

  test("csv header matches reference layout (writer.go:142-156)") {
    val ents = GraphqlSchema.parse(sdl)
    assert(CsvSerializer.header(ents.head) ===
      Seq("id", "block_range", "active", "daily_volume_usd", "raw", "tags", "tx_count"))
    assert(CsvSerializer.header(ents(1)) === Seq("id", "block$", "amount"))
  }

  test("serialize renders ranges, arrays, bytes and typed nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ents = GraphqlSchema.parse(sdl)
    val rows = Seq(
      ("t1", 10L, Some(20L), Some("12.5"), None: Option[Long], Seq("a,b", "c"), true),
      ("t2", 20L, None, Some("0.1"), Some(7L), Seq.empty[String], false)
    ).toDF("id", "start_block", "end_block", "dv", "tx_count", "tags", "active")
      .select($"id", $"start_block", $"end_block",
        $"dv".cast("decimal(20,1)").as("daily_volume_usd"),
        $"tx_count", $"tags", $"active",
        lit(null).cast("binary").as("raw"))
    val out = CsvSerializer.serialize(rows, ents.head)
      .orderBy("id").collect()

    val r1 = out(0)
    assert(r1.getAs[String]("block_range") === "[10,20)")
    assert(r1.getAs[String]("tags") === "{a\\,b,c}")
    assert(r1.getAs[String]("tx_count") === "NULL")  // nullable BigInt
    assert(r1.getAs[String]("raw") === "NULL")       // nullable Bytes
    assert(r1.getAs[String]("daily_volume_usd") === "12.5")
    val r2 = out(1)
    assert(r2.getAs[String]("block_range") === "[20,)")
    assert(r2.getAs[String]("tags") === "{}")
    assert(r2.getAs[String]("tx_count") === "7")
    assert(r2.getAs[String]("active") === "false")
  }
}
