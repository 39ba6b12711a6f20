package graft.streaming

import graft.queries.TextAnalysis
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming BM25 serving (the continuous-retrieval form of
  * `tx_bm25`, the lexical sibling of [[AnnStream]]): queries arrive on
  * a stream as (query_id, term) rows and each is answered with its
  * exact BM25 top-k over a STANDING document corpus — the "find the
  * training docs matching this incoming query" path an online
  * curation/decontamination pipeline serves.
  *
  * Spark-first: the reference side is the SAME standing scoring index
  * the batch key reads ([[TextAnalysis.bm25ScoringIndex]]: one
  * (t, doc_id, c, df, dl, avgdl) row per posting, memoized +
  * persisted), so candidate generation is a stateless stream-static
  * equi-join on the term; the per-posting score is attached as a
  * COLUMN before any stateful operator (every input it needs rides
  * the row), and the per-query sum + top-k runs in
  * `flatMapGroupsWithState` keyed by query id. The handler is
  * STATELESS by design (every query is fully answered within its
  * arrival micro-batch; fMGWS only because plain flatMapGroups is not
  * allowed on a stream) and its buffer is the query's posting hits —
  * bounded by Σ df over the query's terms, the same bound the batch
  * join carries, never the corpus.
  *
  * Parity: identical integer scoring ([[TextAnalysis.bm25TermScore]]),
  * identical (score DESC, doc_id ASC) ranking — a stream fed the
  * batch key's query set must produce ITS EXACT rows (spec-gated).
  */
object Bm25Stream {

  case class Ranked(query_id: Long, rk: Int, doc_id: Long, score: Long)

  /** Exact BM25 top-k per streaming query. `stream` needs
    * (query_id LONG, t STRING) rows — a query's terms may span rows
    * but must arrive within one micro-batch. Terms with no postings
    * contribute nothing; a query with only such terms emits nothing
    * (the batch key's absent-term semantics).
    *
    * The one-micro-batch arrival contract is ENFORCED, not merely
    * documented: each answered query_id leaves a marker in GroupState,
    * and a fragment of the same query arriving in a LATER micro-batch
    * is dropped (never a second, overlapping top-k with duplicate rk
    * values downstream) and counted on `lateFragments` so a violated
    * arrival contract is observable. Per-key marker state is one long;
    * pass `answeredRetention` (e.g. "1 hour") to expire markers on a
    * processing-time timeout and bound total state at any ingest rate
    * — opt-in because a processing-time timeout makes Spark trigger
    * no-data micro-batches continuously to fire expirations (the right
    * trade for a long-lived production stream, pure spin for a
    * replay/test harness that drives the stream with
    * processAllAvailable). */
  def topkContinuous(stream: DataFrame, index: DataFrame,
                     k: Int = TextAnalysis.Bm25TopK,
                     lateFragments: Option[org.apache.spark.util.LongAccumulator] = None,
                     answeredRetention: Option[String] = None): Dataset[Ranked] = {
    // input guard: a null query_id or term would NPE the tuple encoder
    // mid-batch (the PackStream rule) — drop such rows instead
    val scored = stream
      .filter(col("query_id").isNotNull && col("t").isNotNull)
      .join(index, "t")
      .select(col("query_id"), col("doc_id"),
        TextAnalysis.bm25TermScore.as("ts"))
    implicit val re: org.apache.spark.sql.Encoder[Ranked] = Encoders.product[Ranked]
    implicit val le: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val te: org.apache.spark.sql.Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    val timeout =
      if (answeredRetention.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    scored.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        topk(k, lateFragments, answeredRetention))
  }

  /** Per-query handler: sum term scores per doc (exact longs — the
    * same integer sum the batch groupBy computes, associativity-free),
    * rank (score DESC, doc_id ASC), keep k. State is the
    * answered-query marker (see [[topkContinuous]]). */
  private def topk(k: Int,
                   lateFragments: Option[org.apache.spark.util.LongAccumulator],
                   answeredRetention: Option[String])(
      qid: Long, rows: Iterator[(Long, Long, Long)],
      state: GroupState[Long]): Iterator[Ranked] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    if (state.exists) {
      // late fragment of an already-answered query: the arrival
      // contract is violated — drop it (emitting would produce a
      // second overlapping top-k for the same query_id) and count it
      val n = rows.size.toLong
      lateFragments.foreach(_.add(n))
      state.update(state.get + n)
      answeredRetention.foreach(state.setTimeoutDuration)
      return Iterator.empty
    }
    val byDoc = scala.collection.mutable.LongMap.empty[Long]
    rows.foreach { case (_, doc, ts) =>
      byDoc.update(doc, byDoc.getOrElse(doc, 0L) + ts)
    }
    state.update(0L)
    answeredRetention.foreach(state.setTimeoutDuration)
    byDoc.toSeq.sortBy { case (doc, sc) => (-sc, doc) }
      .take(k).zipWithIndex
      .map { case ((doc, sc), i) => Ranked(qid, i + 1, doc, sc) }
      .iterator
  }
}
