package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous conversion funnel (SURVEY.md §2 #41d) — the streaming
  * form of the batch `q_window_funnel` query: each user's ordered
  * view → click → purchase progress folds into CONSTANT per-user state
  * (three longs), refreshed as events arrive.
  *
  * Spark-first: the batch query's three step minima are whole-frame
  * window aggregates; the streaming form is the same recurrence run
  * forward — s1 = first view, s2 = first click after s1, s3 = first
  * purchase after s2 — which needs only the current (s1, s2, s3) to
  * absorb a new event, exactly what `mapGroupsWithState` holds. The
  * step readoff applies the batch query's horizon rule unchanged
  * ([[graft.queries.Analytics.FunnelHorizonUs]]).
  *
  * Contract: per-user events must arrive in event-time order (the
  * [[PackStream]]/[[PoiStableHashStream]] ordered-feed rule) — the
  * recurrence is order-dependent: a view arriving late could lower s1
  * and resurrect a click this fold already discarded, so out-of-order
  * input would need unbounded look-back that constant state cannot
  * hold. Within a micro-batch, rows are sorted by timestamp before
  * folding; that buffer is bounded by the micro-batch's rows per user,
  * the same bound every other in-batch sort here documents. */
object FunnelStream {

  /** Sentinel for "step not reached yet". */
  val Unset: Long = Long.MinValue

  /** One refreshed row per user per micro-batch that touched them;
    * `step` already applies the horizon rule, so a consumer can read
    * conversion counts straight off the latest row per user —
    * `n_folds` identifies that latest row in an update-mode sink
    * without relying on sink row order (the [[QuantileStream]]
    * convention). */
  case class FunnelState(user_id: Long, n_folds: Long, s1: Long, s2: Long, s3: Long,
      step: Int)

  /** Fold a streaming events frame (user_id, event_type, ts) into
    * per-user funnel state. Run with `outputMode("update")`. */
  def steps(events: DataFrame): Dataset[FunnelState] = {
    implicit val fe: org.apache.spark.sql.Encoder[FunnelState] = Encoders.product[FunnelState]
    implicit val ke: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val te: org.apache.spark.sql.Encoder[(Long, String, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.scalaLong)
    implicit val se: org.apache.spark.sql.Encoder[(Long, Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong)
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }

  private def fold(user: Long, rows: Iterator[(Long, String, Long)],
      state: GroupState[(Long, Long, Long, Long)]): FunnelState = {
    var (s1, s2, s3, folds) = state.getOption.getOrElse((Unset, Unset, Unset, 0L))
    // in-batch sort: bounded by this micro-batch's rows for ONE user
    rows.toSeq.sortBy(_._3).foreach { case (_, et, t) =>
      et match {
        case "view" if s1 == Unset => s1 = t
        case "click" if s1 != Unset && s2 == Unset && t > s1 => s2 = t
        case "purchase" if s2 != Unset && s3 == Unset && t > s2 => s3 = t
        case _ => ()
      }
    }
    state.update((s1, s2, s3, folds + 1))
    val h = graft.queries.Analytics.FunnelHorizonUs
    val step =
      if (s3 != Unset && s3 <= s1 + h) 3
      else if (s2 != Unset && s2 <= s1 + h) 2
      else if (s1 != Unset) 1
      else 0
    FunnelState(user, folds + 1, s1, s2, s3, step)
  }
}
