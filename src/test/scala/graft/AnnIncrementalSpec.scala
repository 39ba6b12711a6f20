package graft

import graft.functions.Vectors
import graft.queries.Ann
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ann_lsh_incremental (#33d) — the incremental-family contract on the
  * ANN serving index: folding a batch into the standing bucket index
  * must be indistinguishable from rebuilding the index on the full
  * corpus, for ANY prior/batch split including the two extremes.
  */
class AnnIncrementalSpec extends SparkSpec {

  private def quantizedCorpus: DataFrame =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.quantize(col("embedding")).as("qv"))
      .withColumn("n2", Vectors.dot(col("qv"), col("qv")))
      .filter(col("n2") > 0)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("gated split: incremental entry == full rebuild entry") {
    assert(rows(Ann.annLshIncremental(spark, sf)) === rows(Ann.annLshBucket(spark, sf)))
  }

  test("any split folds to the rebuilt index (thirds, all-new, empty batch)") {
    val e = quantizedCorpus
    val full = rows(Ann.lshAnswer(Ann.lshIndex(e), e))
    for (pred <- Seq(col("vec_id") % 3 === 0, lit(true), lit(false))) {
      val merged = Ann.lshIndex(e.filter(!pred))
        .unionAll(Ann.lshIndex(e.filter(pred)))
      assert(rows(Ann.lshAnswer(merged, e)) === full, s"split $pred diverged")
    }
  }
}
