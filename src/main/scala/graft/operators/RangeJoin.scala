package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join as an EQUI-join.
  *
  * Spark plans a raw `p.d >= i.start AND p.d < i.end` join as a
  * BroadcastNestedLoopJoin — O(points × intervals) predicate
  * evaluations and a broadcast of a whole side, the classic range-join
  * gap. The scalable rewrite decomposes time into fixed-width BUCKETS:
  * every interval explodes to the buckets it covers (⌈len/W⌉ + 1 rows
  * at width W), every point maps to exactly one bucket, the join
  * becomes a hash equi-join on the bucket id, and the exact predicate
  * re-filters the bucket-coarse matches. Work is O(points + intervals
  * · len/W + output) and the join shuffles/broadcasts by bucket like
  * any other key — AQE handles skewed buckets the way it handles any
  * hot key.
  *
  * Width is the classic tuning knob: W ≈ the typical interval length
  * keeps the per-interval expansion ~2 while keeping buckets selective
  * (the same bucketing trade-off the LSH band index makes).
  */
object RangeJoin {

  private val Epoch = lit("1970-01-01").cast("date")

  /** Bucket id of a date at `widthDays` granularity (exact: datediff
    * is an int32, the division is a double op on values ≪ 2^52). */
  def dateBucket(d: Column, widthDays: Int): Column =
    floor(datediff(d, Epoch) / lit(widthDays)).cast("int")

  /** All bucket ids a half-open [start, endExclusive) interval covers. */
  def intervalBuckets(start: Column, endExclusive: Column, widthDays: Int): Column =
    sequence(dateBucket(start, widthDays),
      dateBucket(date_sub(endExclusive, 1), widthDays))

  /** Joins `points` to every interval containing its `pointDate`:
    * half-open `[start, endExclusive)` semantics. Returns all columns
    * of both inputs. */
  def pointInInterval(
      points: DataFrame, pointDate: Column,
      intervals: DataFrame, start: Column, endExclusive: Column,
      widthDays: Int): DataFrame = {
    val ib = intervals.withColumn("__bucket",
      explode(intervalBuckets(start, endExclusive, widthDays)))
    val pb = points.withColumn("__bucket", dateBucket(pointDate, widthDays))
    pb.join(ib, Seq("__bucket"))
      .filter(pointDate >= start && pointDate < endExclusive)
      .drop("__bucket")
  }
}
