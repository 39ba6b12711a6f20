package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word n-gram shingling shared by the dedup family (SURVEY.md §2
  * #28-30). A document's shingle set is its distinct consecutive-word
  * 3-grams; documents with fewer than n words have an empty set.
  * Pure higher-order expressions — shingling 100 TB of text is a
  * map-only stage.
  *
  * PERFORMANCE CONTRACT: [[fromTokens]] takes an already-materialized
  * token-array COLUMN, not an inline `split(...)` expression. An inline
  * split gets re-evaluated for every `element_at` inside the transform
  * lambda (O(tokens²) per doc — measured 12× slower at sf0.1); callers
  * must project the tokens first:
  * {{{
  *   df.withColumn("w", Shingles.tokens($"text"))
  *     .select($"doc_id", explode(Shingles.fromTokens($"w")).as("sh"))
  * }}}
  */
object Shingles {

  val N = 3

  def tokens(text: Column): Column = split(text, " ")

  def fromTokens(w: Column, n: Int = N): Column =
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Distinct 60-bit HASHES of the n-gram shingles — what every dedup
    * consumer actually needs (jaccard buckets key on the shingle,
    * minhash/simhash hash it immediately). Hashing inside the array
    * keeps the exploded rows and every downstream shuffle at 8 bytes
    * per shingle instead of a ~20-char string (~2× on the explode+agg
    * stages at sf0.1), and the distinct compares longs, not strings. */
  def hashedFromTokens(w: Column, n: Int = N): Column =
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => conv(substring(md5(
          concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*)), 1, 15), 16, 10)
          .cast("long"))))
      .otherwise(array().cast("array<long>"))

  /** DuckDB twin: CTE producing (doc_id, s) exploded distinct shingles
    * of `documents.text`. */
  def shinglesCteSql(n: Int = N): String = {
    val parts = (0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]")
      .mkString(" || ' ' || ")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(generate_series(1, greatest(len(w) - ${n - 1}, 0)),
       |                               i -> $parts)) AS s
       |  FROM toks
       |)""".stripMargin
  }

  /** DuckDB twin of [[hashedFromTokens]]: (doc_id, h) rows. */
  def hashedShinglesCteSql(n: Int = N): String =
    s"""${shinglesCteSql(n)},
       |hsh AS (SELECT doc_id, ${PortableHash.long60Sql("s")} AS h FROM sh)""".stripMargin
}
