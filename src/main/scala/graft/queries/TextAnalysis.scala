package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis family (SURVEY.md §2 #34-37) over `documents`.
  *
  * Ratio scores are reported as exact integers (×1000, integer
  * division) — FP division is not bit-portable across engines, integer
  * arithmetic is (SURVEY.md §4). Every operator is a map-only
  * projection: at 100 TB these run at scan speed with zero shuffle.
  */
object TextAnalysis {

  /** Tiny per-language stopword sets for the overlap heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不")
  )
  val LangOrder = Seq("en", "es", "de", "fr", "zh")

  /** BPE-ish token pattern: letter runs, digit runs, single others. */
  val TokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  private def toks(c: Column): Column = split(c, " ")

  // ---- #34 token counting -------------------------------------------

  def txTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_ws"),
      size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0))).cast("long").as("n_bpe"))

  val txTokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '$TokenPattern')) AS BIGINT) AS n_bpe
       |FROM documents""".stripMargin

  // ---- #35 quality scoring ------------------------------------------

  /** Doc quality: token count, stopword ratio, alpha-char ratio —
    * ratios ×1000 in exact integer division. */
  def txQualityScore(s: SparkSession, d: String): DataFrame = {
    val en = Stopwords("en")
    Tables.documents(s, d)
      .withColumn("w", toks(col("text")))
      .withColumn("n_tok", size(col("w")).cast("long"))
      .withColumn("n_stop", size(filter(col("w"), t => t.isInCollection(en))).cast("long"))
      .withColumn("n_alpha", length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
      .select(col("doc_id"), col("n_tok"),
        expr("n_stop * 1000 DIV n_tok").as("stop_x1000"),
        expr("n_alpha * 1000 DIV length(text)").as("alpha_x1000"))
  }

  val txQualityScoreSql: String = {
    val en = Stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ($en))) AS BIGINT) * 1000
       |    // CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_x1000,
       |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) * 1000
       |    // CAST(length(text) AS BIGINT) AS alpha_x1000
       |FROM documents""".stripMargin
  }

  // ---- #36 language id ----------------------------------------------

  /** Stopword-overlap language guess: distinct-token overlap with each
    * language's set; argmax with fixed tie-break order. */
  def txLangId(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .withColumn("wd", array_distinct(toks(col("text"))))
    val scored = LangOrder.foldLeft(base) { (df, l) =>
      df.withColumn(s"s_$l",
        size(array_intersect(col("wd"), typedLit(Stopwords(l)))).cast("long"))
    }
    val best = LangOrder.map(l => col(s"s_$l")) match {
      case cols => greatest(cols: _*)
    }
    val guess = LangOrder.foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"s_$l") === best && best > 0, l).otherwise(acc)
    }
    scored.select(
      col("doc_id") +: LangOrder.map(l => col(s"s_$l")) :+ guess.as("lang_guess"): _*)
  }

  val txLangIdSql: String = {
    val scores = LangOrder.map { l =>
      val ws = Stopwords(l).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_intersect(wd, [$ws])) AS BIGINT) AS s_$l"
    }.mkString(",\n  ")
    val best = "greatest(" + LangOrder.map(l => s"s_$l").mkString(", ") + ")"
    val guess = LangOrder.foldRight("'und'") { (l, acc) =>
      s"CASE WHEN s_$l = $best AND $best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH t AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS wd FROM documents),
       |scored AS (
       |  SELECT doc_id,
       |  $scores
       |  FROM t)
       |SELECT doc_id, ${LangOrder.map(l => s"s_$l").mkString(", ")},
       |       $guess AS lang_guess
       |FROM scored""".stripMargin
  }

  // ---- #37 fingerprint ----------------------------------------------

  /** Normalized-text fingerprint: lowercase, strip non-alnum, collapse
    * whitespace, md5. */
  def txFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " "))).as("fingerprint"))

  val txFingerprintSql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
      |FROM documents""".stripMargin

  // ---- registry ------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_token_count" -> (txTokenCount _),
    "tx_quality_score" -> (txQualityScore _),
    "tx_lang_id" -> (txLangId _),
    "tx_fingerprint" -> (txFingerprint _)
  )

  val oracles: Map[String, String] = Map(
    "tx_token_count" -> txTokenCountSql,
    "tx_quality_score" -> txQualityScoreSql,
    "tx_lang_id" -> txLangIdSql,
    "tx_fingerprint" -> txFingerprintSql
  )
}
