package graft.sources

import graft.sources.GraphqlSchema.{EntityDesc, Field, FieldType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** graph-node CSV → typed columns: the INVERSE of
  * [[graft.operators.CsvSerializer]] / [[graft.functions.GraphCsv]],
  * so an existing bundle store (the CSVs the reference's `tocsv`
  * writes for postgres COPY, csvprocessor/writer.go:142-311) can be
  * read BACK into Spark for reprocessing, auditing, or migration —
  * the input-format side of the surface, where the reference only
  * ever re-reads its CSVs through postgres.
  *
  * Everything is a column expression (regex/split/transform/unhex),
  * so parsing a 100 TB store is a map-only scan. Gated by the
  * round-trip spec (GraphCsvReader round-trips the golden fixture and
  * randomized rows: serialize → csv → read → re-serialize is
  * byte-identical) — see GoldenCsvSpec.
  *
  * Faithfulness notes (properties of the FORMAT, shared with the
  * reference's own loader):
  *   - a NULLABLE field's text `NULL` reads as SQL null — postgres
  *     COPY does the same for every column outside FORCE_NOT_NULL
  *     (inject_csv.go:88-106), so a nullable String holding the
  *     literal word "NULL" does not round-trip in either system;
  *   - non-nullable fields are taken verbatim (the FORCE_NOT_NULL
  *     set), so `` / `0` / `false` read as values, never null;
  *   - a NULLABLE field holding an EMPTY string collapses to null
  *     (the writer renders both as an empty cell; postgres COPY
  *     outside FORCE_NOT_NULL loads that cell as NULL — same
  *     collapse, same direction);
  *   - NUL characters were stripped at write time (writer.go:213-215),
  *     which is what makes NUL safe as the unescape sentinel below.
  */
object GraphCsvReader {

  /** `[start,end)` / `[start,)` → start block (entity.go:23-29). */
  def blockRangeStart(c: Column): Column =
    regexp_extract(c, "^\\[(\\d+),", 1).cast("long")

  /** `[start,end)` → EXCLUSIVE end block; `[start,)` (live row) →
    * null. */
  def blockRangeEnd(c: Column): Column =
    when(regexp_extract(c, ",(\\d+)\\)$", 1) === "", lit(null).cast("long"))
      .otherwise(regexp_extract(c, ",(\\d+)\\)$", 1).cast("long"))

  /** `\x<hex>` → binary (inverse of GraphCsv.byteaHex). */
  def bytea(c: Column): Column = unhex(regexp_replace(c, "^\\\\x", ""))

  /** `{a,b}` of `\x..` elements → array<binary>. An empty `{}` is an
    * empty array (hex never contains commas — plain split). */
  def byteaArray(c: Column): Column = {
    val body = regexp_replace(c, "^\\{|\\}$", "")
    when(body === "", array().cast("array<binary>"))
      .otherwise(transform(split(body, ","), e => bytea(e)))
  }

  /** `{a\,b,c\\d}` → array<string>, exactly inverting
    * [[graft.functions.GraphCsv.escapedStringArray]]'s `\`→`\\`,
    * `,`→`\,` (writer.go:188-215). Escaped and separator commas are
    * disambiguated in three codegen'd passes:
    *   1. `\\` → NUL  (the writer strips NUL from every element, so
    *      NUL cannot collide with data — the one guaranteed-free
    *      sentinel this format has);
    *   2. split on `,` not preceded by `\` (after pass 1 every
    *      remaining `\` is the escape of a comma, so the bounded
    *      single-char lookbehind is exact);
    *   3. per element, `\,` → `,` and NUL → `\`. */
  def stringArray(c: Column): Column = {
    val body = regexp_replace(c, "^\\{|\\}$", "")
    when(body === "", array().cast("array<string>"))
      .otherwise(transform(
        split(regexp_replace(body, "\\\\\\\\", "\u0000"), "(?<!\\\\),"),
        e => regexp_replace(regexp_replace(e, "\\\\,", ","), "\u0000", "\\\\")))
  }

  /** One typed column per serialized field, postgres-COPY null
    * semantics: nullable ∧ text `NULL` → null; otherwise parse by
    * type. BigInt/BigDecimal stay as their exact TEXT form (the
    * format's canonical representation — a consumer casts to the
    * precision it needs; an eager cast here would pick a scale the
    * schema does not declare). */
  def typedColumn(f: Field): Column = {
    val raw = col(f.name)
    val parsed: Column = (f.fieldType, f.array) match {
      case (FieldType.Bytes, false)      => bytea(raw)
      case (FieldType.Bytes, true)       => byteaArray(raw)
      case (_, true)                     => stringArray(raw)
      case (FieldType.Int32, false)      => raw.cast("int")
      case (FieldType.Bool, false)       => raw.cast("boolean")
      case (_, false)                    => raw
    }
    val v =
      if (f.nullable) when(raw === "NULL", lit(null)).otherwise(parsed)
      else (f.fieldType, f.array) match {
        // FORCE_NOT_NULL semantics: an empty cell in a non-nullable
        // column loads as the EMPTY value, never SQL null (postgres
        // COPY with the inject_csv.go:88-106 column set does the
        // same). Only String/Bytes can legitimately serialize empty —
        // the writer emits 0 / false / {…} for every other type.
        case (FieldType.Str | FieldType.Id, false) => coalesce(parsed, lit(""))
        case (FieldType.Bytes, false) => coalesce(parsed, lit(Array.empty[Byte]))
        case _ => parsed
      }
    v.as(f.name)
  }

  /** Parse a raw CSV frame (string columns named by
    * [[graft.operators.CsvSerializer.header]]) back to typed entity
    * rows: id, start_block, end_block (null for live / absent for
    * immutable via `block$`), then every field. */
  def readEntity(raw: DataFrame, desc: EntityDesc): DataFrame = {
    val range: Seq[Column] =
      if (desc.immutable) Seq(col("block$").cast("long").as("start_block"))
      else Seq(blockRangeStart(col("block_range")).as("start_block"),
        blockRangeEnd(col("block_range")).as("end_block"))
    val fields = desc.orderedFields.filter(_.name != "id").map(typedColumn)
    raw.select(col("id") +: range ++: fields: _*)
  }

  /** Read a written CSV bundle (one file or a directory of bundles)
    * into typed entity rows. The options mirror the writer's Go-csv
    * conventions (quote `"`, doubled-quote escape, header row).
    *
    * Scale note: `multiLine` CSVs are not SPLITTABLE — Spark reads
    * each file in one task (a quoted field may span any byte
    * boundary, so there is no safe intra-file split point). That is
    * the right trade here BY CONSTRUCTION of the store: the bundle
    * layout bounds every file to one block range
    * ([[graft.operators.Bundler]]), so a 100 TB store is millions of
    * bounded files and the scan parallelizes across FILES — the same
    * unit the reference's loader streams one COPY at a time. */
  def read(spark: org.apache.spark.sql.SparkSession, path: String,
           desc: EntityDesc): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("escape", "\"")
      .option("emptyValue", "")
      // quoted fields may span lines (Go csv writes raw newlines
      // inside quotes); multiLine parses whole records, not lines
      .option("multiLine", "true")
      // the writer never emits a bare unquoted empty-vs-null
      // distinction; read empty as empty string, NULL text is handled
      // typed per column above
      .option("nullValue", "\u0000")
      .csv(path)
    readEntity(raw, desc)
  }
}
