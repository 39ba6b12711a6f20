package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Point-in-time (as-of) join — the per-row generalization of
  * graph-node's `block_range @> B` time travel (SURVEY.md §2 #16): for
  * every left row, attach the latest right row with the same key whose
  * time is <= the left row's time.
  *
  * Spark has no native as-of join; the scalable realization is the
  * UNION + MERGE-WINDOW trick: tag both inputs, union them, and run one
  * window per key ordered by (time, tag) carrying `last_value(...,
  * ignoreNulls)` of the right columns; left rows then read the most
  * recent right values. Cost: ONE shuffle on the key and a
  * partition-local sort — no range-condition join (which Spark would
  * execute as a broadcast-nested-loop or an exploded theta join).
  * Rows for one key stay together, so this holds at 100 TB exactly
  * like the SCD2 window does.
  */
object AsofJoin {

  /** leftOn/rightOn: (key, time) columns; valueCols: right columns to
    * carry. Output = left columns + `asof_<valueCol>`s.
    *
    * `rightTieBreak`: right-side columns appended (ascending, nulls
    * first) to the window order AT EQUAL time, so several right rows
    * sharing (key, time) resolve deterministically to the LAST row
    * under that order — for a single tie-break column that is exactly
    * "dedup ties by MAX" WITHOUT the pre-aggregation exchange a
    * groupBy dedup would cost (one full shuffle of the right corpus
    * saved; the selection is row-wise, so with several valueCols the
    * winning ROW supplies all of them jointly). Empty = caller
    * guarantees (key, time) uniqueness on the right, or accepts an
    * arbitrary-but-single row at ties. */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      valueCols: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {

    val lCols = left.columns.toSeq
    val tagged =
      left.select(
        col(leftKey).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__is_left") +:
          (lCols.map(c => col(c).as(s"l_$c")) ++
            valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"r_$c"))): _*)
        .unionByName(
          right.select(
            col(rightKey).as("__k") +: col(rightTime).as("__t") +: lit(0).as("__is_left") +:
              (lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"l_$c")) ++
                valueCols.map(c => col(c).as(s"r_$c"))): _*))

    // right rows (tag 0) sort before left rows at equal time => a right
    // row AT the left row's time is visible (matches ASOF's <=); the
    // tie-break columns order right rows WITHIN an equal time so
    // last() lands on the canonical one (left rows are all-null on
    // them — ordering among left duplicates is irrelevant, each left
    // row emits itself)
    val ord = col("__t") +: col("__is_left") +:
      rightTieBreak.map(c => col(s"r_$c").asc_nulls_first)
    val w = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // each right row carries a non-null marker STRUCT around its value:
    // last(ignoreNulls) then distinguishes "no right row yet" (null
    // struct → null result) from a right row whose value is genuinely
    // NULL (non-null struct, null field → NULL carried faithfully,
    // matching DuckDB ASOF rather than skipping to an older value)
    val carried = valueCols.foldLeft(tagged) { (df, c) =>
      val marked = when(col("__is_left") === 0,
        struct(lit(true).as("set"), col(s"r_$c").as("v")))
      df.withColumn(s"asof_$c",
        last(marked, ignoreNulls = true).over(w).getField("v"))
    }
    carried.filter(col("__is_left") === 1)
      .select(lCols.map(c => col(s"l_$c").as(c)) ++
        valueCols.map(c => col(s"asof_$c")): _*)
  }
}
