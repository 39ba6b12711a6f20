package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization (SURVEY.md §2 #41b) — the continuous form
  * of the batch `q_sessionize` query: events collapse into per-user
  * sessions that close after a quiet gap, finalized and emitted
  * append-only once the watermark passes the session end.
  *
  * Spark-first: the native `session_window` grouping carries the whole
  * semantics — gap-merging, state, and watermark eviction live in the
  * session-window state store, no custom `mapGroupsWithState` needed.
  * Scale: state is partitioned by (user_id) like every other per-entity
  * stream here; per-key state is the single open session struct, and
  * the watermark bounds how long it can stay open.
  */
object SessionStream {

  /** Per-user sessions with a `gap` inactivity close, emitted once
    * final. `events` needs (ts: timestamp, user_id, value: double).
    * `session_value` sums exact cents (the fixed-point convention of
    * the batch twin) and presents a double. */
  def sessions(events: DataFrame, gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        // BigDecimal-free HALF_UP cents — the SAME definition as the
        // batch twin (one shared form, so they can't drift); the spec
        // pins stream == batch exactly
        (sum(graft.functions.HalfUpCents.cents(col("value")))
          .cast("double") / 100.0)
          .as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("session_value"))
}
