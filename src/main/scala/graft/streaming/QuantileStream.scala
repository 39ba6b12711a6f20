package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous quantile sketching — `q_quantile_hist`'s streaming form,
  * completing the sketch-serving trio ([[HllStream]] = max-monoid
  * distinct, [[CmsStream]] = sum-monoid frequency, this = sum-monoid
  * RANK): a fixed 1024-bin histogram folds under counter-wise
  * addition, so a value stream collapses into CONSTANT per-key state —
  * 8 KiB of long counters per event type, independent of stream
  * length — that answers any later quantile probe with error ≤ one
  * bin width, where a streaming exact quantile would hold every value.
  *
  * Spark-first: the bin projection is the SAME column pipeline as the
  * batch query ([[graft.queries.Analytics.histRows]]), and the
  * readoff applies the batch query's exact integer rule
  * (`cum·100 ≥ p·n` — no FP percentile interpolation), so the
  * streamed quantiles equal the batch sketch EXACTLY after any batch
  * split (spec-gated against [[graft.queries.Analytics
  * .qQuantileHist]]).
  *
  * Contract (the incremental-family disjointness rule): each event
  * arrives ONCE — sums are not idempotent, so replay dedup is the
  * upstream concern ([[StreamingDedup]]), same as [[CmsStream]]. */
object QuantileStream {

  /** One refreshed quantile row per event type per micro-batch that
    * touched it; `n_folds` lets a consumer pick each key's latest row
    * out of an update-mode sink without relying on sink row order. */
  case class Quantiles(event_type: String, n_folds: Long, n: Long,
      p50_lb: Long, p90_lb: Long, p99_lb: Long)

  /** Fold a streaming events frame (event_type, value, …) into
    * per-type bin-counter state; emits the updated quantiles for each
    * event type touched by the micro-batch. Run with
    * `outputMode("update")`. */
  def sketchContinuous(events: DataFrame): Dataset[Quantiles] = {
    val rows = graft.queries.Analytics.histRows(events)
    implicit val qe: org.apache.spark.sql.Encoder[Quantiles] = Encoders.product[Quantiles]
    implicit val ke: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val te: org.apache.spark.sql.Encoder[(String, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    implicit val se: org.apache.spark.sql.Encoder[(Array[Long], Long)] =
      Encoders.tuple(Encoders.kryo[Array[Long]], Encoders.scalaLong)
    rows.as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }

  /** Counter-wise add of the batch's bins into the standing 8 KiB
    * array, then the batch rule's readoff: the p-quantile lower bound
    * is the smallest bin whose cumulative count satisfies
    * `cum·100 ≥ p·n` (exact integers throughout). */
  private def fold(et: String, rows: Iterator[(String, Long)],
      state: GroupState[(Array[Long], Long)]): Quantiles = {
    val nb = graft.queries.Analytics.HistBins
    val (bins, folds) = state.getOption.getOrElse((new Array[Long](nb), 0L))
    rows.foreach { case (_, b) => bins(b.toInt) += 1L }
    state.update((bins, folds + 1))
    var n = 0L
    var i = 0
    while (i < nb) { n += bins(i); i += 1 }
    def q(p: Int): Long = {
      var cum = 0L
      var j = 0
      while (j < nb) {
        cum += bins(j)
        if (cum * 100 >= p.toLong * n) return j.toLong
        j += 1
      }
      (nb - 1).toLong
    }
    Quantiles(et, folds + 1, n, q(50), q(90), q(99))
  }
}
