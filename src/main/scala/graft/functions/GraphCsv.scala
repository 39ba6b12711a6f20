package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** graph-node CSV field serialization (SURVEY.md §2 #7-10).
  *
  * The reference serializes entity fields to postgres-COPY CSV with
  * graph-node's conventions (reference csvprocessor/writer.go:188-311,
  * entity.go:23-29). Re-expressed as pure column expressions — every one
  * stays inside whole-stage codegen, so serializing 100 TB of rows is a
  * map-only stage with zero shuffle.
  */
object GraphCsv {

  /** #7 — `[start,stop)` / `[start,)` block-range text
    * (entity.go:23-29). */
  def blockRangeText(start: Column, end: Column): Column =
    concat(lit("["), start.cast("string"), lit(","),
      coalesce(end.cast("string"), lit("")), lit(")"))

  /** #8 — Bytes → postgres bytea `\x<hex>` (writer.go:217-226). The
    * reference base64-decodes then hex-encodes; here the bytes arrive as
    * a binary column and the expression is `'\x' || lower(hex(b))`. */
  def byteaHex(bytes: Column): Column =
    concat(lit("\\x"), lower(hex(bytes)))

  /** #9 — string-array → `{a,b}` with `\`→`\\`, `,`→`\,` and NUL
    * stripped (writer.go:188-215). Higher-order `transform` keeps the
    * escaping per-element and codegen'd. */
  def escapedStringArray(arr: Column): Column = {
    val esc = transform(arr, x =>
      regexp_replace(
        regexp_replace(
          regexp_replace(x, "\\u0000", ""), // strip NUL (toValidString, writer.go:213-215)
          "\\\\", "\\\\\\\\"),   // \  -> \\
        ",", "\\\\,"))           // ,  -> \,
    concat(lit("{"), array_join(esc, ","), lit("}"))
  }

  /** #10 — typed NULL/default rendering per GraphQL nullability
    * (writer.go:228-311): nullable → literal `NULL`; non-nullable
    * String→``, Int/BigInt/BigDecimal→`0`, Boolean→`false`. Scalar
    * String/ID values also strip NUL (`toValidString`,
    * writer.go:213-215 — postgres COPY rejects NUL in text), matching
    * the strip [[escapedStringArray]] applies per element. The
    * reference routes BigInt/BigDecimal strings through the same
    * strip; here those values are rendered from numeric casts, which
    * cannot contain NUL, so the (regex) strip is confined to the
    * string types rather than taxing every numeric cell. */
  def typedText(v: Column, graphType: String, nullable: Boolean): Column = {
    val dflt = graphType match {
      case "String" | "ID" | "Bytes"        => ""
      case "Int" | "BigInt" | "BigDecimal"  => "0"
      case "Boolean"                        => "false"
      case other => throw new IllegalArgumentException(s"invalid field type: $other")
    }
    val vv = graphType match {
      case "String" | "ID" => regexp_replace(v.cast("string"), "\u0000", "")
      case _               => v.cast("string")
    }
    if (nullable) coalesce(vv, lit("NULL"))
    else coalesce(vv, lit(dflt))
  }
}
