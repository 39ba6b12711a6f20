package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free (co-located) joins.
  *
  * At 100 TB the dominant cost of the fact-to-fact joins
  * (lineitem⋈orders, change-stream⋈version-store) is the shuffle. If
  * both sides are stored bucketed by the join key with the same bucket
  * count, Spark's scan reports the hash partitioning and
  * EnsureRequirements inserts NO exchange: the join runs scan-local.
  * This is the storage-layout arm of the engine's scale story — the
  * batch analogue of the streaming state-store sharding.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table — ONE file per
    * bucket: the writer is repartitioned on the bucket key first, so
    * each bucket is written by exactly one task. That is what lets the
    * scan report the sortBy ORDER (FileSourceScanExec only propagates
    * outputOrdering when every bucket is a single file — with multiple
    * files per bucket the concatenated read is unordered and every
    * downstream sort-merge join pays a full re-Sort of the fact
    * table, silently forfeiting half the layout's benefit). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketedSorted(df, table, key, Seq(key), buckets)

  /** [[writeBucketed]] with an explicit in-bucket sort order beyond the
    * bucket key — the layout for per-key WINDOW consumers: bucketed by
    * the partition key and sorted by (key, time, tiebreak), so a
    * window like `partitionBy(key).orderBy(time, tiebreak)` needs
    * neither exchange NOR sort at read time (under the sorted-scan
    * conf; unordered whole-frame windows need only the key prefix).
    * `sortCols` must lead with `key` — the scan's reported ordering is
    * exactly the sortBy list, and a window's required ordering always
    * leads with its partition keys. */
  def writeBucketedSorted(df: DataFrame, table: String, key: String,
                          sortCols: Seq[String], buckets: Int): Unit = {
    require(sortCols.headOption.contains(key),
      s"sortCols must lead with the bucket key '$key' (got $sortCols)")
    df.repartition(buckets, df(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table) // managed: under spark.sql.warehouse.dir
  }

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero shuffle when bucket specs line up. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
