package graft

import graft.operators.{CopyInjector, EntityVersioner}
import graft.sources.{EntityChanges, GraphqlSchema}
import org.apache.spark.sql.functions._

class CopyInjectorSpec extends SparkSpec {

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

  test("copy statement tracks the parsed schema: header order and FORCE_NOT_NULL set") {
    val sql = CopyInjector.copyStatement(ents.head, "sgd1")
    // column list is exactly the CSV header (no vid — the serial assigns it)
    assert(sql.contains(
      """COPY sgd1.token_day_data ("id","block_range","daily_volume_usd","tags","tx_count") FROM STDIN"""))
    assert(sql.contains("""FORMAT CSV, HEADER"""))
    // non-nullable: id + range column + NOT NULL fields, never nullable ones
    assert(sql.contains("""FORCE_NOT_NULL ("id","block_range","daily_volume_usd","tags")"""))
    assert(!sql.contains("""FORCE_NOT_NULL ("id","block_range","daily_volume_usd","tags","tx_count")"""))
  }

  test("immutable entity uses block$ in both column list and FORCE_NOT_NULL") {
    val sql = CopyInjector.copyStatement(ents(1), "sgd1")
    assert(sql.contains("""("id","block$","amount")"""))
    assert(sql.contains("""FORCE_NOT_NULL ("id","block$","amount")"""))
  }

  test("file pruning follows the reference loader's block-range rule") {
    val files = Seq(
      "token_day_data/0000000000-0000001000.csv",
      "token_day_data/0000001000-0000002000.csv",
      "token_day_data/0000002000-0000003000.csv",
      "token_day_data/0000001000-0000002000.csv.tmp", // not .csv-suffixed range? still contains .csv
      "token_day_data/noise.txt")
    // start=1500 keeps the file whose range ENDS at/after it; stop=3000 drops
    // ranges starting at/after; the .csv.tmp crash leftover must be skipped
    val picked = CopyInjector.filesToLoad(
      Seq(files(2), files(0), files(1), files(3), files(4)),
      desiredStartBlock = 1500, stopBlock = 3000)
    assert(picked === Seq(files(1), files(2)).sorted)
    // stop=0 means no stop bound
    val all = CopyInjector.filesToLoad(Seq(files(0), files(1), files(2)), 0, 0)
    assert(all === Seq(files(0), files(1), files(2)))
    // boundary resume: the name's end block is INCLUSIVE (reference
    // bundler/writer/common.go:30), so a bundle covering 0..999 must
    // NOT reload when resuming from block 1000
    val done = "token_day_data/0000000000-0000000999.csv"
    assert(CopyInjector.filesToLoad(Seq(done), desiredStartBlock = 1000, stopBlock = 0).isEmpty)
    assert(CopyInjector.filesToLoad(Seq(done), desiredStartBlock = 999, stopBlock = 0) === Seq(done))
  }

  test("manifest vid ranges are the serial counter's assignment in file order") {
    val versions = EntityVersioner.scd2Versions(EntityChanges.changes(spark, sf))
    val m = CopyInjector.manifest(versions, ents.head, "sgd1", bundleSize = 250)
    val total = versions.count()
    assert(m.files.map(_.nRows).sum === total)
    // contiguous, gap-free vid ranges starting at 1, ascending in block order
    assert(m.files.head.vidStart === 1L)
    m.files.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.vidStart === a.vidEnd + 1, s"$a -> $b")
        assert(b.bundle > a.bundle)
      case _ =>
    }
    assert(m.files.last.vidEnd === total)
    m.files.foreach(f => assert(f.vidEnd - f.vidStart + 1 === f.nRows))
    // file names carry the 10-digit range the loader regex expects,
    // with the reference's INCLUSIVE end block
    m.files.foreach(f => assert(f.file.matches("token_day_data/\\d{10}-\\d{10}\\.csv")))
    assert(m.files.head.file ===
      f"token_day_data/${m.files.head.bundle * 250}%010d-${m.files.head.bundle * 250 + 249}%010d.csv")
    // per-bundle counts match an independent computation
    val want = versions.groupBy((col("start_block") / 250).cast("long")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m.files.map(f => f.bundle -> f.nRows).toMap === want)
  }

  test("schema entity listing includes the implicit poi2$ entity") {
    val names = GraphqlSchema.entityNames(
      """type TokenDayData @entity { id: ID! }
        |type Transfer @entity(immutable: true) { id: ID! }""".stripMargin)
    assert(names === Seq("token_day_data", "transfer", "poi2$"))
    val poi = GraphqlSchema.parseWithPoi("type A @entity { id: ID! }").last
    assert(poi.name === "poi2$")
    assert(poi.fields("digest").fieldType === GraphqlSchema.FieldType.Bytes)
    assert(!poi.fields("digest").nullable)
    // the poi table serializes and COPYies like any other entity
    val sql = CopyInjector.copyStatement(poi, "sgd1")
    assert(sql.contains("""COPY sgd1.poi2$ ("id","block_range","digest")"""))
  }

  test("handoff statement matches the reference's deployment update") {
    val sql = CopyInjector.handoffSql("QmDeployHash", "0xABC123", 1234L)
    assert(sql === "UPDATE subgraphs.subgraph_deployment set " +
      "latest_ethereum_block_hash='ABC123',latest_ethereum_block_number=1234," +
      "entity_count=1000000,firehose_cursor='' where deployment='QmDeployHash'")
    intercept[IllegalArgumentException](CopyInjector.handoffSql("bad", "0x0", 1L))
  }

  test("load script is drop-indexes, ordered copies, create-indexes, analyze") {
    val versions = EntityVersioner.scd2Versions(EntityChanges.changes(spark, sf))
    val m = CopyInjector.manifest(versions, ents.head, "sgd1", bundleSize = 250)
    val script = CopyInjector.loadScript(m, ents.head)
    val lines = script.linesIterator.toSeq
    val dropIdx = lines.indexWhere(_.startsWith("DROP INDEX"))
    val copyIdx = lines.indexWhere(_.startsWith("\\copy"))
    val createIdx = lines.indexWhere(_.startsWith("CREATE INDEX"))
    assert(dropIdx >= 0 && copyIdx > dropIdx && createIdx > copyIdx)
    assert(lines.count(_.startsWith("\\copy")) === m.files.size)
    assert(lines.last.startsWith("ANALYZE"))
    // every copy line loads with the same options as the COPY statement
    assert(lines.filter(_.startsWith("\\copy"))
      .forall(_.contains("FORCE_NOT_NULL (\"id\",\"block_range\",\"daily_volume_usd\",\"tags\")")))
    // drop/create sets mirror each other
    assert(lines.count(_.startsWith("DROP INDEX")) === lines.count(_.startsWith("CREATE INDEX")))
  }

  test("extract-indexes: catalog snapshot filters, orders, and renders like the reference") {
    import CopyInjector.CatalogIndexRow
    // a pg_indexes snapshot: both schema tables, a foreign table the
    // GraphQL schema doesn't know (must drop, extract-indexes.go:129),
    // and a row from another pg schema (the WHERE clause drops it)
    def row(t: String, i: String) =
      CatalogIndexRow("sgd1", t, i, s"""CREATE INDEX $i ON "sgd1"."$t" USING btree (x)""")
    val catalog = Seq(
      row("transfer", "transfer_id"),
      row("token_day_data", "token_day_data_block_range"),
      row("token_day_data", "attr_token_day_data_0_daily_volume_usd"),
      row("poi2$", "poi2_id"), // not in the GraphQL schema -> dropped
      row("token_day_data", "token_day_data_id"),
      CatalogIndexRow("sgd2", "transfer", "other_schema", "CREATE INDEX other"))
    val got = CopyInjector.extractIndexes(catalog, "sgd1", ents)
    // grouped per table, (table, index) ordered, defs ;-terminated
    assert(got.map(_._1) === Seq("token_day_data", "transfer"))
    assert(got.head._2.map(_._1) === Seq(
      "attr_token_day_data_0_daily_volume_usd",
      "token_day_data_block_range", "token_day_data_id"))
    assert(got.flatMap(_._2.map(_._2)).forall(_.endsWith(";")))
    assert(!got.flatMap(_._2.map(_._1)).contains("poi2_id"))
    assert(!got.flatMap(_._2.map(_._1)).contains("other_schema"))
    val ddl = CopyInjector.createIndexesDdl(got)
    assert(ddl.linesIterator.size === 4)
    assert(ddl.endsWith(";\n"))
  }

  test("extract-indexes: inventory diff flags missing and unexpected indexes") {
    import CopyInjector.CatalogIndexRow
    // the catalog a healthy deployment of `ents` would carry = exactly
    // DdlGenerator's inventory -> empty diff
    val healthy = ents.flatMap { d =>
      graft.operators.DdlGenerator.indexDdls(d, "sgd1").map { ddl =>
        val name = ddl.split('"')(1)
        CatalogIndexRow("sgd1", d.name, name, ddl.stripSuffix(";"))
      }
    }
    assert(CopyInjector.indexInventoryDiff(healthy, "sgd1", ents) === ((Nil, Nil)))
    // drop one + plant a stray: both reported, sorted
    val broken = healthy.filterNot(_.indexname == "transfer_id") :+
      CatalogIndexRow("sgd1", "transfer", "manual_hack_idx", "CREATE INDEX manual_hack_idx")
    val (missing, extra) = CopyInjector.indexInventoryDiff(broken, "sgd1", ents)
    assert(missing === Seq("transfer_id"))
    assert(extra === Seq("manual_hack_idx"))
  }
}
