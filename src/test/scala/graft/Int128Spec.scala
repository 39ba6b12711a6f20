package graft

import org.apache.spark.sql.functions._

/** Pins the native int128 product-sum aggregate to Spark's own exact
  * decimal arithmetic (the declarative twin it replaces in the hot
  * path) on adversarial magnitudes, signs, nulls, and group shapes —
  * plus the loud-overflow contract. */
class Int128Spec extends SparkSpec {

  private def viaSum128(df: org.apache.spark.sql.DataFrame) = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    df.groupBy(col("g"))
      .agg(expr("graft_sum128_product(a, b)").cast("string").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
  }

  private def viaDecimal(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(sum(col("a").cast("decimal(19,0)") * col("b").cast("decimal(19,0)"))
        .cast("decimal(38,0)").cast("string").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

  test("sum128 == exact decimal twin on adversarial vectors") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Long, java.lang.Long, java.lang.Long)] = Seq(
      // products past Long.Max in both directions — the case that
      // makes the long fast path impossible
      (1L, Long.MaxValue, Long.MaxValue),
      (1L, Long.MaxValue, Long.MinValue),
      (1L, Long.MinValue, Long.MinValue),
      // sign mixes and carry-boundary low words
      (2L, -1L, 1L), (2L, -1L, -1L), (2L, 0L, Long.MaxValue),
      (2L, 4294967296L, 4294967296L), // 2^32 * 2^32 = 2^64: hi=1, lo=0
      (2L, 4294967295L, 4294967297L), // (2^32-1)(2^32+1) = 2^64-1: lo all-ones
      // null on either side skips the row, like SUM
      (3L, null, 5L), (3L, 7L, null), (3L, 3L, 4L),
      // an all-null group sums to NULL
      (4L, null, null),
      // realistic sf10-shaped magnitudes
      (5L, 9900149999L, 9900019999L), (5L, 9900149999L, -9900019999L))
    val df = rows.toDF("g", "a", "b")
    val got = viaSum128(df)
    val want = viaDecimal(df)
    assert(got === want)
    assert(got(3L) === "12")
    assert(got(4L) === null)
  }

  test("deterministic magnitude sweep matches the decimal twin across partitions") {
    val s = spark
    import s.implicits._
    var seed = 0x2545f4914f6cdd1dL
    def next(): Long = { seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17; seed }
    val rows = (0 until 20000).map { i =>
      (next() % 7, next() % (1L << (5 + (i % 58))), next() % (1L << (5 + ((i * 7) % 58))))
    }
    val df = rows.toDF("g", "a", "b").repartition(8)
    assert(viaSum128(df) === viaDecimal(df))
  }

  test("int128 overflow fails loudly, never wraps") {
    val s = spark
    import s.implicits._
    // 2^126 per row: three rows overflow past 2^127
    val big = (1 to 3).map(_ => (1L, Long.MaxValue, Long.MaxValue))
    val err = intercept[Exception] {
      viaSum128((big ++ big).toDF("g", "a", "b"))
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null) &&
      causes(err).exists(c => Option(c.getMessage).exists(_.contains("int128 overflow"))),
      err.toString)
  }
}
