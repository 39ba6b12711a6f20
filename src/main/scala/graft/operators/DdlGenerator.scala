package graft.operators

import graft.sources.GraphqlSchema.{EntityDesc, Field, FieldType}

/** graph-node-style postgres DDL from an [[EntityDesc]].
  *
  * The reference's `inject-csv` COPYies into tables whose DDL
  * graph-node created, and `create-index`/`drop-index`/`extract-index`
  * replay that DDL around a bulk load (reference
  * cmd/substreams-sink-graph-load/create-indexes.go,
  * inject_csv.go:88-106 — non-nullable column tracking). This generator
  * produces the equivalent surface directly from the parsed schema so a
  * load built with [[CsvSerializer]] has matching target tables:
  *
  *   - column types per graph-node convention: ID/String→text,
  *     Int→int4, BigInt/BigDecimal→numeric, Bytes→bytea,
  *     Boolean→bool, arrays→`[]`;
  *   - mutable entities: `vid bigserial` + `block_range int4range` with
  *     a GiST index for `block_range @> B` time travel;
  *   - immutable entities: `block$ int4` + btree (writer.go:142-166's
  *     layout);
  *   - per-attribute btree indexes, drop/create statement pairs for
  *     index-free bulk loading.
  */
object DdlGenerator {

  def pgType(f: Field): String = {
    val base = f.fieldType match {
      case FieldType.Id | FieldType.Str => "text"
      case FieldType.Int32              => "int4"
      case FieldType.BigInt             => "numeric"
      case FieldType.BigDecimal         => "numeric"
      case FieldType.Bytes              => "bytea"
      case FieldType.Bool               => "bool"
      case FieldType.Float64            => "numeric"
    }
    if (f.array) base + "[]" else base
  }

  def tableDdl(desc: EntityDesc, pgSchema: String): String = {
    val rangeCol =
      if (desc.immutable) """"block$" int4 NOT NULL"""
      else "block_range int4range NOT NULL"
    val fieldCols = desc.orderedFields.filter(_.name != "id").map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s""""${f.name}" ${pgType(f)}$nn"""
    }
    val cols = Seq(
      "vid bigserial PRIMARY KEY",
      "id text NOT NULL",
      rangeCol
    ) ++ fieldCols
    s"""CREATE TABLE "$pgSchema"."${desc.name}" (
       |  ${cols.mkString(",\n  ")}
       |);""".stripMargin
  }

  /** Index DDL: per-attribute btree plus the range/block index used by
    * as-of queries. */
  def indexDdls(desc: EntityDesc, pgSchema: String): Seq[String] = {
    val t = s""""$pgSchema"."${desc.name}""""
    val rangeIdx =
      if (desc.immutable)
        s"""CREATE INDEX "${desc.name}_block" ON $t USING btree ("block$$");"""
      else
        s"""CREATE INDEX "${desc.name}_block_range" ON $t USING gist (block_range);"""
    val attrIdxs = desc.orderedFields.filter(_.name != "id").zipWithIndex.map {
      case (f, i) =>
        val method = if (f.array) "gin" else "btree"
        s"""CREATE INDEX "attr_${desc.name}_${i}_${f.name}" ON $t USING $method ("${f.name}");"""
    }
    (s"""CREATE INDEX "${desc.name}_id" ON $t USING btree (id);""" +: rangeIdx +: attrIdxs)
  }

  /** Drop statements for index-free bulk COPY, mirrored from the
    * create set (reference drop-indexes.go flow). */
  def dropIndexDdls(desc: EntityDesc, pgSchema: String): Seq[String] =
    indexDdls(desc, pgSchema).map { ddl =>
      val name = ddl.split('"')(1)
      s"""DROP INDEX IF EXISTS "$pgSchema"."$name";"""
    }
}
