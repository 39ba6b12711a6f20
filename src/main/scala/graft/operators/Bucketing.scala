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

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
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
