package graft

import org.apache.spark.sql.functions._
import graft.functions.HalfUpCents

/** Property twin-gate for the primitive HALF_UP cents kernel: on EVERY
  * double — not just 2-decimal money values — `HalfUpCents.cents(x)`
  * must equal Spark's own `round(x*100)` (the BigDecimal reference
  * semantics it replaces in the hot path). The adversarial set targets
  * the two documented boundary classes of the naive floor(x+0.5) form:
  *
  *   - products just below a tie, where `d + 0.5` rounds UP in double
  *     arithmetic (d = 0.49999999999999994: naive floor gives 1,
  *     HALF_UP of the value gives 0);
  *   - magnitudes at/above 2^52, where `d + 0.5` ties-to-even bumps an
  *     odd integer (naive form off by 1 where round() is exact);
  *
  * plus ties, near-ties from both sides, negatives of everything, and
  * a deterministic pseudo-random sweep across magnitudes.
  */
class CentsSpec extends SparkSpec {

  /** The doubles are crafted so x*100 lands on the boundary being
    * tested (the kernel multiplies internally, so adversarial values
    * are stated as the PRODUCT d and fed as d/100 where that division
    * is exact, or directly where it isn't). */
  private def adversarialProducts: Seq[Double] = {
    val boundary = Seq(
      0.49999999999999994, // largest double < 0.5: the +0.5 trap
      0.5, 1.5, 2.5, 3.5, // exact ties (HALF_UP: away from zero)
      0.5 - math.ulp(0.5), 0.5 + math.ulp(0.5),
      2.5 - math.ulp(2.5), 2.5 + math.ulp(2.5),
      4503599627370495.5, // largest tie below 2^52
      4503599627370496.0, // 2^52 itself
      4503599627370497.0, // odd integer ≥ 2^52: ties-to-even trap
      9007199254740991.0, // 2^53 - 1 (odd, exact)
      9.0e15, 1.8e16, 9.0e16, // large but |d·100| still inside long
      0.0, 1.0, 0.004999999999999999, 99.995, 1998.9999999999998)
    boundary ++ boundary.map(-_)
  }

  test("cents(x) == round(x*100) on adversarial boundary doubles") {
    val s = spark
    import s.implicits._
    // feed x = d/100 AND x = d directly: the former exercises products
    // that reconstruct near the boundary after the internal *100, the
    // latter makes the boundary product itself reachable exactly
    // (d/100*100 is not always d in doubles)
    val xs = (adversarialProducts.map(_ / 100.0) ++ adversarialProducts)
      .distinct.filter(d => !d.isInfinite)
    val df = xs.toDF("x")
      .select(col("x"),
        HalfUpCents.cents(col("x")).as("fast"),
        round(col("x") * 100).cast("long").as("ref"))
    val bad = df.where(col("fast") =!= col("ref") ||
      col("fast").isNull =!= col("ref").isNull).collect()
    assert(bad.isEmpty, s"divergent: ${bad.mkString(", ")}")
  }

  test("cents(x) == round(x*100) on a deterministic magnitude sweep") {
    val s = spark
    import s.implicits._
    // xorshift-seeded sweep over exponents 2^-10 .. 2^52 (the cents
    // contract: |x·100| fits a long) — no Math.random, reproducible
    var seed = 0x9e3779b97f4a7c15L
    def next(): Long = { seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17; seed }
    val xs = (0 until 4000).map { i =>
      val exp = (i % 63) - 10
      val mant = 1.0 + math.abs(next() % 1000000L) / 1000000.0
      val sign = if (next() % 2 == 0) 1.0 else -1.0
      sign * mant * math.pow(2.0, exp.toDouble)
    }
    val df = xs.toDF("x")
      .select(HalfUpCents.cents(col("x")).as("fast"),
        round(col("x") * 100).cast("long").as("ref"))
    assert(df.where(col("fast") =!= col("ref")).count() === 0L)
  }

  /** Documents the KNOWN divergence class between the cents algebra
    * and `cast(x AS decimal(20,2))`: the cast rounds the double's
    * shortest decimal repr at 2 dp, cents rounds the double PRODUCT
    * x·100 — different functions wherever the stored double sits just
    * below a representational tie whose shortest repr IS the tie.
    * Both graft and the DuckDB oracle compute the cents form (round ==
    * cents on every double in both engines: an integer-rounding of the
    * binary value and of its shortest repr can only disagree across a
    * .5 boundary, and a shortest repr ending exactly in .5 round-trips
    * to a different double), so this divergence never reaches the
    * correctness gate — this test pins that it EXISTS, so nobody
    * reintroduces the decimal-cast form on one side only. */
  test("cents(x) vs cast(x as decimal(20,2)): known divergence at representational ties") {
    val s = spark
    import s.implicits._
    val rows = Seq(1.005, 1.015, 1.025, 0.125, 2.675, -1.005)
      .toDF("x")
      .select(
        HalfUpCents.cents(col("x")).as("cents"),
        (col("x").cast("decimal(20,2)") * 100).cast("long").as("cast100"))
      .collect()
    // 1.005 → cents 100 (product 100.4999…) vs cast 101 ("1.005" HALF_UP)
    assert(rows(0).getLong(0) === 100L && rows(0).getLong(1) === 101L)
    assert(rows(1).getLong(0) === 101L && rows(1).getLong(1) === 102L)
    assert(rows(2).getLong(0) === 102L && rows(2).getLong(1) === 103L)
    // 0.125 stores exactly: both 13 (no divergence off the tie class)
    assert(rows(3).getLong(0) === 13L && rows(3).getLong(1) === 13L)
    // 2.675's PRODUCT re-rounds UP to the representational tie 267.5
    // (within half an ulp), so the two forms agree there — the
    // divergence class is "product stays below the tie", not "x has a
    // 3-decimal repr"
    assert(rows(4).getLong(0) === 268L && rows(4).getLong(1) === 268L)
    assert(rows(5).getLong(0) === -100L && rows(5).getLong(1) === -101L)
  }

  test("null propagates") {
    val s = spark
    import s.implicits._
    val r = Seq[Option[Double]](None, Some(1.005))
      .toDF("x").select(HalfUpCents.cents(col("x"))).collect()
    assert(r(0).isNullAt(0))
  }
}
