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
    df.repartition(buckets, df(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: under spark.sql.warehouse.dir

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero shuffle when bucket specs line up. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
