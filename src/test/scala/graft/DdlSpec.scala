package graft

import graft.operators.DdlGenerator
import graft.sources.GraphqlSchema
import org.scalatest.funsuite.AnyFunSuite

class DdlSpec extends AnyFunSuite {

  private val ents = GraphqlSchema.parse(
    """type TokenDayData @entity {
      |  id: ID!
      |  dailyVolumeUSD: BigDecimal!
      |  txCount: BigInt
      |  tags: [String!]!
      |}
      |type Transfer @entity(immutable: true) {
      |  id: ID!
      |  amount: BigInt!
      |}""".stripMargin)

  test("mutable table: vid serial, int4range block_range, typed columns") {
    val ddl = DdlGenerator.tableDdl(ents.head, "sgd1")
    assert(ddl.contains("\"sgd1\".\"token_day_data\""))
    assert(ddl.contains("vid bigserial PRIMARY KEY"))
    assert(ddl.contains("block_range int4range NOT NULL"))
    assert(ddl.contains("\"daily_volume_usd\" numeric NOT NULL"))
    assert(ddl.contains("\"tx_count\" numeric"))
    assert(ddl.contains("\"tags\" text[] NOT NULL"))
  }

  test("immutable table uses block$ int4") {
    val ddl = DdlGenerator.tableDdl(ents(1), "sgd1")
    assert(ddl.contains("\"block$\" int4 NOT NULL"))
    assert(!ddl.contains("block_range"))
  }

  test("indexes: gist range for mutable, btree block for immutable, gin arrays") {
    val idx = DdlGenerator.indexDdls(ents.head, "sgd1")
    assert(idx.exists(d => d.contains("USING gist (block_range)")))
    assert(idx.exists(d => d.contains("USING gin (\"tags\")")))
    val idxIm = DdlGenerator.indexDdls(ents(1), "sgd1")
    assert(idxIm.exists(d => d.contains("USING btree (\"block$\")")))
  }

  test("drop set mirrors create set one-to-one") {
    val creates = DdlGenerator.indexDdls(ents.head, "sgd1")
    val drops = DdlGenerator.dropIndexDdls(ents.head, "sgd1")
    assert(creates.length === drops.length)
    drops.foreach(d => assert(d.startsWith("DROP INDEX IF EXISTS \"sgd1\".")))
  }
}
