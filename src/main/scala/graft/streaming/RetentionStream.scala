package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous cohort retention (SURVEY.md §2 #41e) — the streaming
  * form of the batch `q_retention` grid: each user's activity folds
  * into CONSTANT per-user state (cohort week + one 64-bit activity
  * bitmask), refreshed as events arrive.
  *
  * Spark-first: the batch query attaches each user's first-ever week
  * with a whole-frame window; the streaming form keeps that minimum
  * in the state store and records week offsets as BITS — offset k
  * from the cohort week sets bit k, so the full retention row for a
  * user is one long at any history depth. The grid is a plain
  * downstream aggregation over the latest state rows (bit k of user
  * mask → (cohort_week, offset k) cell).
  *
  * Unlike [[FunnelStream]], this fold is ORDER-INDEPENDENT: a week
  * minimum and a bit-set both commute, and a late-arriving EARLIER
  * week rebases the mask by left-shifting existing offsets (`mask <<
  * delta`) before claiming bit 0 — so out-of-order delivery needs no
  * look-back at all. The one declared bound: offsets ≥
  * [[RetentionStream.HorizonWeeks]] fall off the mask (and a rebase
  * of more than the horizon drops the far tail), the fixed
  * observation horizon every production retention dashboard has
  * anyway. Within the horizon, streamed state == batch grid exactly
  * (spec-gated, including shuffled cross-batch delivery). */
object RetentionStream {

  /** Observation horizon: offsets representable in the 64-bit mask. */
  val HorizonWeeks: Int = 64

  /** One refreshed row per user per micro-batch that touched them;
    * `n_folds` identifies the latest row in an update-mode sink (the
    * [[FunnelStream]]/[[QuantileStream]] convention). Bit k of `mask`
    * = active in week `cohort_week + k`; bit 0 is always set. */
  case class RetentionState(user_id: Long, n_folds: Long, cohort_week: Long,
      mask: Long)

  /** Fold a streaming events frame (user_id, ts) into per-user cohort
    * state. Run with `outputMode("update")`. */
  def weeks(events: DataFrame): Dataset[RetentionState] = {
    implicit val re: org.apache.spark.sql.Encoder[RetentionState] =
      Encoders.product[RetentionState]
    implicit val ke: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    implicit val te: org.apache.spark.sql.Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val se: org.apache.spark.sql.Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV ${graft.queries.Analytics.WeekUs}").as("wk"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }

  private def fold(user: Long, rows: Iterator[(Long, Long)],
      state: GroupState[(Long, Long, Long)]): RetentionState = {
    var (first, mask, folds) = state.getOption.getOrElse((Long.MaxValue, 0L, 0L))
    rows.foreach { case (_, w) =>
      if (first == Long.MaxValue) { first = w; mask = 1L }
      else if (w >= first) {
        val k = w - first
        if (k < HorizonWeeks) mask |= 1L << k
      } else {
        // late earlier week: rebase — existing offsets all grow by
        // delta (JVM << is mod-64, so guard the full-horizon shift)
        val delta = first - w
        mask = if (delta >= HorizonWeeks) 0L else mask << delta
        first = w
        mask |= 1L
      }
    }
    state.update((first, mask, folds + 1))
    RetentionState(user, folds + 1, first, mask)
  }

  /** Expand latest per-user state rows into the batch grid shape
    * (cohort_week, week_offset, active_users) — the tiny downstream
    * agg a dashboard runs over the state table. */
  def grid(latest: DataFrame): DataFrame =
    latest
      .select(col("cohort_week"),
        explode(expr(s"filter(sequence(0, ${HorizonWeeks - 1}), " +
          "k -> (shiftright(mask, k) & 1) = 1)")).as("week_offset"))
      .select(col("cohort_week"), col("week_offset").cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
}
