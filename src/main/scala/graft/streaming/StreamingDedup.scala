package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — dd_exact's continuous form.
  *
  * `dropDuplicatesWithinWatermark` on the content hash: the state
  * store keeps one entry per distinct hash and ages it out once the
  * watermark passes the entry's event time — bounded state, unlike an
  * unbounded distinct. Plain `dropDuplicates("text_hash")` would NOT
  * evict: Spark only ages dedup state when the event-time column is
  * part of the key set, so key-only dedup needs the
  * within-watermark variant. This is the standard ingestion-time
  * guard in a training-data pipeline: exact re-crawls/replays within
  * the horizon are dropped before any downstream work sees them.
  */
object StreamingDedup {

  /** Emit only the first occurrence of each text hash; `ts` is the
    * event-time column bounding state via `watermarkDelay`. */
  def firstOccurrences(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_hash")
}
