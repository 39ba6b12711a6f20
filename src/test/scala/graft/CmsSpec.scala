package graft

import graft.functions.PortableHash
import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._

/** tx_cms_topk (#34m) — the Count-Min estimates must dominate the
  * exact counts (structural guarantee: a counter sums every key that
  * lands in its cell, including the probed one), match a sequential
  * in-memory fold of the raw shingle stream (the weighted-vocab fold
  * the operator uses is arithmetically the same), and stay within the
  * published additive error at this corpus size.
  */
class CmsSpec extends SparkSpec {

  private lazy val out =
    TextAnalysis.txCmsTopk(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

  // raw per-doc-distinct shingle stream, folded sequentially
  private lazy val (cmsRef, totalN) = {
    import graft.functions.Shingles
    val sh = Tables.documents(spark, sf)
      .withColumn("w", split(col("text"), " "))
      .select(explode(Shingles.fromTokens(col("w"))).as("s"))
      .collect().map(_.getString(0))
    val cells = Array.ofDim[Long](TextAnalysis.CmsDepth, TextAnalysis.CmsWidth.toInt)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString.take(15), 16)
    for (s <- sh) {
      val h = h60(s)
      for (i <- 0 until TextAnalysis.CmsDepth) {
        val (a, b) = PortableHash.permCoef(201 + i)
        val bucket = ((h % PortableHash.P) * a + b) % PortableHash.P % TextAnalysis.CmsWidth
        cells(i)(bucket.toInt) += 1L
      }
    }
    (cells, sh.length.toLong)
  }

  test("estimates dominate the exact counts and the output is the exact top-K") {
    assert(out.nonEmpty)
    out.foreach { case (s, exact, est) =>
      assert(est >= exact, s"$s: est $est < exact $exact")
    }
  }

  test("operator estimates == sequential stream fold (weighted fold is exact)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long =
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString.take(15), 16)
    out.foreach { case (s, _, est) =>
      val h = h60(s)
      val ref = (0 until TextAnalysis.CmsDepth).map { i =>
        val (a, b) = PortableHash.permCoef(201 + i)
        val bucket = ((h % PortableHash.P) * a + b) % PortableHash.P % TextAnalysis.CmsWidth
        cmsRef(i)(bucket.toInt)
      }.min
      assert(est === ref, s"$s: operator est $est != stream fold $ref")
    }
  }

  test("additive error stays within the Count-Min bound at this corpus") {
    // per the CM analysis E[err] = N/width per row; min over rows is
    // far tighter — allow the full single-row expectation ×4 slack
    val bound = 4L * totalN / TextAnalysis.CmsWidth + 1
    out.foreach { case (s, exact, est) =>
      assert(est - exact <= bound, s"$s: err ${est - exact} > bound $bound (N=$totalN)")
    }
  }
}
