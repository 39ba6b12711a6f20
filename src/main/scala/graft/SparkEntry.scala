package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each operator family contributes a `queries` map (name → dataframe
  * program) and an `oracles` map (name → equivalent DuckDB SQL). The
  * driver runs every query at sf0.01, runs the oracle SQL in DuckDB on
  * the same parquet, and hash-compares.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The SCD2 versioner is the reference's core behavior — the
    * whole tocsv stage in one window. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.GraphLoad.glScd2Versions(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.GraphLoad.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Ann.queries ++
      graft.queries.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (marked rows-only in SURVEY.md §2). */
  def oracleSql: Map[String, String] =
    graft.queries.GraphLoad.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.Dedup.oracles ++
      graft.queries.TextAnalysis.oracles ++
      graft.queries.Ann.oracles ++
      graft.queries.Multimodal.oracles
}
