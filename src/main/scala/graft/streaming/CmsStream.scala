package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous Count-Min sketching — `tx_cms_topk`'s streaming form,
  * closing the sketch-serving pair started by [[HllStream]]: CMS
  * counters are a commutative monoid under addition (element insert
  * and sketch merge are both counter-wise sum), so a document stream
  * folds into CONSTANT state — `CmsDepth` keys × `CmsWidth` longs,
  * 64 KiB total, independent of stream length — that answers any
  * later frequency probe in O(depth), where streaming exact counting
  * holds the full vocabulary.
  *
  * Spark-first: the shingle/cell projection is the SAME column
  * pipeline as the batch query ([[graft.queries.TextAnalysis
  * .cmsCells]]); the state key is the sketch ROW (depth index), so
  * the fold parallelizes across rows and each handler owns one
  * 16 KiB counter array. Addition commutes, so the streamed counters
  * equal the batch registers EXACTLY after any batch split
  * (spec-gated against [[graft.queries.TextAnalysis.cmsRegisters]]).
  *
  * Contract (the incremental-family disjointness rule): each document
  * arrives ONCE — sums are not idempotent, so replay dedup is the
  * upstream concern ([[StreamingDedup]]), exactly as for the standing
  * batch states. */
object CmsStream {

  /** One sketch row per micro-batch that touched it: `n_folds` lets a
    * consumer pick the latest row from an update-mode sink; `regs` is
    * the full counter array — the servable state (a probe takes
    * `min_i regs_i(bucket_i(key))` across the `CmsDepth` rows). */
  case class SketchRow(i: Int, n_folds: Long, regs: Array[Long])

  /** Fold a streaming documents frame (doc_id, text) into per-row
    * counter state. Run with `outputMode("update")`. */
  def sketchContinuous(docs: DataFrame): Dataset[SketchRow] = {
    val cells = docs
      .filter(col("text").isNotNull)
      .withColumn("w", split(col("text"), " "))
      .select(explode(graft.functions.Shingles.fromTokens(col("w"))).as("shingle"))
      .select(explode(array(graft.queries.TextAnalysis.cmsCells: _*)).as("e"))
      .select(col("e.i").as("i"), col("e.bucket").as("bucket"))
    implicit val oe: org.apache.spark.sql.Encoder[SketchRow] = Encoders.product[SketchRow]
    implicit val ie: org.apache.spark.sql.Encoder[(Int, Long)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val ke: org.apache.spark.sql.Encoder[Int] = Encoders.scalaInt
    implicit val se: org.apache.spark.sql.Encoder[(Array[Long], Long)] =
      Encoders.tuple(Encoders.kryo[Array[Long]], Encoders.scalaLong)
    cells.as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }

  /** Counter-wise sum of the batch's bucket hits into the standing
    * 16 KiB row array. */
  private def fold(i: Int, rows: Iterator[(Int, Long)],
      state: GroupState[(Array[Long], Long)]): SketchRow = {
    val w = graft.queries.TextAnalysis.CmsWidth.toInt
    val (regs, folds) = state.getOption.getOrElse((new Array[Long](w), 0L))
    rows.foreach { case (_, b) => regs(b.toInt) += 1L }
    state.update((regs, folds + 1))
    SketchRow(i, folds + 1, regs.clone())
  }
}
