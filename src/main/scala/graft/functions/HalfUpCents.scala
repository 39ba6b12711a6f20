package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, when}

/** Exact HALF_UP "cents" (scale-2 fixed point) from a double column —
  * bit-identical to Spark's `round(x*100)` / DuckDB's `round(x*100)`
  * on EVERY double, in pure primitive math (no per-row BigDecimal:
  * Spark's Round on DoubleType allocates
  * `BigDecimal.valueOf(d).setScale(...)` per evaluation inside
  * codegen — measured as HALF of q1_agg's entire sf10 runtime).
  *
  * Form: `f = floor(d); f + (d - f >= 0.5 ? 1 : 0)` for d ≥ 0, sign
  * split for HALF_UP (away from zero) on negatives. This is exact —
  * not approximately right — because `d - floor(d)` is an EXACT
  * floating-point subtraction (Sterbenz: for d ≥ 1, floor(d) ≤ d ≤
  * 2·floor(d); for d < 1 the floor is 0), so the `>= 0.5` test
  * compares the true fractional part with no rounding step in
  * between.
  *
  * The naive `floor(d + 0.5)` is NOT exact, and neither is patching
  * it with a `f - d > 0.5` correction — both were tried and rejected:
  *   - d = 0.49999999999999994 (the double below 0.5): `d + 0.5`
  *     ties-to-even UP to 1.0, so the naive form answers 1 where
  *     HALF_UP of the value is 0;
  *   - the patch's own comparison `fl(f - d) > 0.5` ties-to-even DOWN
  *     to exactly 0.5 at that same input (true diff 0.5 + 2⁻⁵⁴ is
  *     halfway between representables), silently un-fixing it;
  *   - odd integers ≥ 2^52: `d + 0.5` ties-to-even bumps d by 1.
  *
  * Shortest-repr vs value rounding: Spark's Round goes through
  * `BigDecimal.valueOf` (shortest decimal string) while this form
  * rounds the IEEE VALUE — they agree at scale 0 because every tie
  * point k.5 (|k| < 2^52) is exactly representable, so no double's
  * shortest repr and value can straddle one (round-trip would break).
  * Domain: |x·100| must fit a long — the contract of ANY cents
  * representation. Spark's floor(double) returns LongType, so beyond
  * that the `f + 1` FAILS LOUDLY under ANSI (Spark 4 default) instead
  * of wrapping; the round().cast(long) reference path throws at the
  * same boundary.
  *
  * Gated bit-for-bit against Spark's own `round()` over adversarial
  * boundary doubles and a magnitude sweep in CentsSpec. */
object HalfUpCents {

  /** HALF_UP round of a NON-NEGATIVE double column (as long —
    * Spark's floor on double is LongType, which keeps the +1 exact). */
  private def posRound(d: Column): Column = {
    val f = floor(d) // exact; and d - f is an exact subtraction
    when(d - f >= 0.5d, f + 1).otherwise(f)
  }

  /** `round(c * 100)` as a long, HALF_UP, primitives only. */
  def cents(c: Column): Column =
    when(c >= 0, posRound(c * 100)).otherwise(-posRound(-c * 100)).cast("long")
}
