package graft

import org.apache.spark.sql.functions._

/** Pins the `graft_pair_counts` kernel (round-12 optimization: one
  * row-local byte pass emitting per-doc pair→count maps) against the
  * positional explode+explode form it replaced in tx_bpe_pairs — the
  * two must agree on the full global pair table, not just the top-K
  * slice the gated key emits. */
class PairCountsSpec extends SparkSpec {

  private def kernelCounts(df: org.apache.spark.sql.DataFrame) = {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    df.select(explode(call_function("graft_pair_counts", col("text")))
        .as(Seq("pair", "n")))
      .groupBy("pair").agg(sum("n").as("cnt"))
  }

  private def positionalCounts(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(split(col("text"), " ")).as("word"))
      .select(explode(when(length(col("word")) >= 2,
        expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))

  private def assertEqualCounts(df: org.apache.spark.sql.DataFrame): Unit = {
    val k = kernelCounts(df).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val p = positionalCounts(df).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(k == p)
  }

  test("kernel == positional twin on the corpus") {
    assertEqualCounts(Tables.documents(spark, sf))
  }

  test("kernel == positional twin on adversarial inputs") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      "",                          // empty doc
      " ",                         // lone space: two empty words
      "a",                         // 1-char word: no pairs
      "ab",                        // exactly one pair
      "aaa bb  c",                 // repeats + double space (empty word)
      "héllo wörld",               // 2-byte code points
      "日本語 テスト",               // 3-byte code points
      "a日b 日日日",                // mixed ASCII/multibyte pairs
      "x😀y",            // supplementary (4-byte) code point
      "ab ab ab ba")               // cross-doc-level duplicate pairs
      .map(org.apache.spark.sql.Row(_))
    val df = spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    assertEqualCounts(df)
  }

  test("served tx_bpe_pairs == composable twin (ordered top-K)") {
    val a = graft.queries.TextAnalysis.txBpePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = graft.queries.TextAnalysis.txBpePairsComposable(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a == b)
  }

  test("null text yields null map (and no served rows)") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val n = spark.sql("SELECT graft_pair_counts(CAST(NULL AS STRING)) AS m")
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
