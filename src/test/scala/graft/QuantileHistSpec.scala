package graft

import graft.queries.Analytics
import org.apache.spark.sql.functions._

/** q_quantile_hist (#26m) — the histogram quantile must bracket the
  * exact quantile within one bin width (the sketch's whole guarantee),
  * and the lower bounds must be monotone across the p's.
  */
class QuantileHistSpec extends SparkSpec {

  private lazy val out =
    Analytics.qQuantileHist(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  private lazy val exact: Map[String, Seq[Double]] =
    Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted.toSeq }

  test("each lower bound brackets the exact quantile within one bin") {
    assert(out.nonEmpty)
    for ((t, (n, p50, p90, p99)) <- out) {
      val vs = exact(t)
      assert(n === vs.length)
      for ((p, lb) <- Seq(50 -> p50, 90 -> p90, 99 -> p99)) {
        // exact p-quantile under the same rule: smallest v with
        // rank*100 >= p*n
        val q = vs(math.ceil(p * n / 100.0).toInt - 1)
        assert(lb <= q && (q < lb + 1 || lb == Analytics.HistBins - 1),
          s"$t p$p: lb $lb does not bracket exact $q")
      }
    }
  }

  test("lower bounds are monotone in p") {
    out.values.foreach { case (_, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99)
    }
  }
}
