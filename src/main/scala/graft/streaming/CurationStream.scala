package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus curation (SURVEY.md §2 #42b) — the continuous form
  * of `tx_curation`'s gate+dedup front half: documents stream in, the
  * quality and repetition gates drop junk statelessly, a
  * watermark-bounded exact dedup admits only first occurrences, and
  * per-event-time-window per-language admission stats finalize at the
  * watermark.
  *
  * Spark-first: this is a CHAIN of two stateful operators
  * (`dropDuplicatesWithinWatermark` → windowed aggregation) in one
  * query — supported natively since Spark 3.5, no foreachBatch glue.
  * The gates stay STATELESS (per-row expressions, including the
  * repetition metric via [[graft.queries.TextAnalysis.dupBigramX1000Expr]]
  * — the per-doc metric is fully contained in the row, so no third
  * stateful operator is needed). State: dedup keys age out at the
  * watermark horizon; window state closes per window. Both shard by
  * their own keys.
  */
object CurationStream {

  val MinTokens = 5L
  /** Drop docs whose duplicated-bigram share exceeds this per-mille —
    * the streaming twin of the batch `tx_repetition` cut. */
  val MaxDupBigramX1000 = 500L

  /** The shared front half: watermark → stateless gates → exact dedup
    * within the watermark horizon. `docs` needs
    * (ts: timestamp, doc_id, text, lang). */
  private def admitted(docs: DataFrame, watermarkDelay: String): DataFrame = {
    graft.plans.GraftExtensions.ensureRegistered(docs.sparkSession)
    docs
      .withWatermark("ts", watermarkDelay)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tok") >= MinTokens)
      .filter(graft.queries.TextAnalysis.dupBigramX1000Expr(col("text"))
        <= MaxDupBigramX1000)
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("text_hash")
  }

  def curatedStats(docs: DataFrame, watermarkDelay: String,
                   windowDuration: String): DataFrame =
    admitted(docs, watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .select(col("window.start").as("win_start"), col("lang"),
        col("n_docs"), col("n_tokens"))

  /** The admitted-document stream itself — what a production curation
    * job actually ships to the corpus store: gate → dedup → PII
    * redaction ([[graft.queries.TextAnalysis.scrubExpr]], stateless,
    * batch-oracle-gated), emitted append-only as each doc clears the
    * dedup state. Stats and docs share the same front half, so a
    * pipeline runs both queries off one source with identical
    * admission semantics. Dedup is on the PRE-scrub hash: two docs
    * differing only inside PII spans are different documents, and
    * scrubbing first would merge them. */
  def curatedDocs(docs: DataFrame, watermarkDelay: String): DataFrame =
    admitted(docs, watermarkDelay)
      .select(col("ts"), col("doc_id"), col("lang"), col("n_tok"),
        graft.queries.TextAnalysis.scrubExpr(col("text")).as("text"))
}
