package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — dd_exact's continuous form.
  *
  * `dropDuplicates` on the content hash with a watermark: the state
  * store keeps one entry per distinct hash inside the watermark
  * horizon and ages them out — bounded state, unlike an unbounded
  * distinct. This is the standard ingestion-time guard in a
  * training-data pipeline: exact re-crawls/replays within the horizon
  * are dropped before any downstream work sees them.
  */
object StreamingDedup {

  /** Emit only the first occurrence of each text hash; `ts` is the
    * event-time column bounding state via `watermarkDelay`. */
  def firstOccurrences(docs: DataFrame, watermarkDelay: String): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("text_hash")
}
