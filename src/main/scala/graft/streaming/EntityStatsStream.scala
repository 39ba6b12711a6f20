package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked per-entity-type stats stream (reference sinker/stats.go:
  * the `run` stage reports rolling per-entity counts and last block as
  * the stream advances).
  *
  * Structured-Streaming re-expression: event-time tumbling windows over
  * the change stream with a watermark bounding state — late changes
  * beyond the watermark are dropped and windows older than it are
  * finalized and emitted (append mode). At scale the state store holds
  * |open windows| × |ops| rows — constant per executor, independent of
  * stream length.
  */
object EntityStatsStream {

  /** Windowed stats over a streaming change DataFrame with an
    * event-time `ts` column: one row per (window, op) once the
    * watermark passes the window end. */
  def windowedStats(changes: DataFrame, windowLength: String, watermarkDelay: String): DataFrame =
    changes
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("op"))
      .agg(
        count(lit(1)).as("n_changes"),
        approx_count_distinct(col("id")).as("approx_ids"),
        max(col("block_num")).as("last_block"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("op"), col("n_changes"), col("approx_ids"), col("last_block"))
}
