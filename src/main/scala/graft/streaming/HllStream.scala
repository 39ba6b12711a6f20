package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous distinct-count sketching — `q_hll_distinct`'s streaming
  * form, and the reason a sketch (not exact distinct) is the right
  * 100 TB primitive: HLL registers are a commutative monoid (element
  * insert and sketch merge are both register-wise max), so a stream
  * can fold every micro-batch into CONSTANT per-key state — 256 bytes
  * per event type, independent of stream length — where streaming
  * exact distinct would hold every key seen.
  *
  * Spark-first: the hash/register/rank projection is the SAME
  * column pipeline as the batch query
  * ([[graft.queries.Analytics.hllRows]]); the fold is one
  * `mapGroupsWithState` handler emitting the refreshed estimate per
  * event type per micro-batch (Update mode). Because insert order
  * never changes a max, the streamed registers — and the one-division
  * estimate — must equal the batch sketch EXACTLY after any batch
  * split (spec-gated).
  */
object HllStream {

  /** `n_folds` counts the micro-batches that touched this key — lets a
    * consumer (and the spec) pick each key's LATEST row out of an
    * update-mode sink without relying on sink row order. */
  case class Estimate(event_type: String, n_folds: Long, zero_regs: Long, hll_est: Double)

  /** Fold a streaming events frame (event_type, user_id, ts) into
    * per-type register state; emits the updated estimate for each
    * event type touched by the micro-batch. Run with
    * `outputMode("update")`. */
  def sketchContinuous(events: DataFrame): Dataset[Estimate] = {
    val rows = graft.queries.Analytics.hllRows(events)
      .select(col("event_type"), col("bucket"), col("rho"))
    implicit val ee: org.apache.spark.sql.Encoder[Estimate] = Encoders.product[Estimate]
    implicit val se: org.apache.spark.sql.Encoder[String] = Encoders.STRING
    implicit val te: org.apache.spark.sql.Encoder[(String, Int, Int)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaInt)
    implicit val ste: org.apache.spark.sql.Encoder[(Array[Byte], Long)] =
      Encoders.tuple(Encoders.BINARY, Encoders.scalaLong)
    rows.as[(String, Int, Int)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(fold)
  }

  /** Register-wise max of the batch's (bucket, rho) rows into the
    * standing 256-byte register array, then the same exact-int64
    * harmonic sum + single double division as the batch query. */
  private def fold(et: String, rows: Iterator[(String, Int, Int)],
      state: GroupState[(Array[Byte], Long)]): Estimate = {
    val m = graft.queries.Analytics.HllM
    val (regs, folds) = state.getOption.getOrElse((new Array[Byte](m), 0L))
    rows.foreach { case (_, b, r) => if (r > regs(b)) regs(b) = r.toByte }
    state.update((regs, folds + 1))
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < m) {
      s += 1L << (53 - regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    Estimate(et, folds + 1, zeros, graft.queries.Analytics.HllAlphaScale / s.toDouble)
  }
}
