package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch undo/reorg canonicalization of a delivery log (SURVEY.md §2
  * #4c).
  *
  * The reference's sinker refuses `BlockUndoSignal` and demands a
  * final-blocks-only stream (reference sinker/sinker.go:291-293); the
  * streaming path here handles live undo signals
  * ([[graft.streaming.EntityChangeStream.closedVersionsWithUndo]]).
  * This operator is the BATCH form of the same semantics: given the raw
  * delivery log (changes in delivery order `seq`) and the undo signals
  * interleaved with it, recover the canonical change set — a delivered
  * change survives iff no LATER undo rolled its block back:
  *
  *   canonical(c)  ⇔  c.block_num <= min{ u.last_valid : u.seq > c.seq }
  *
  * Scale: undo signals are chain reorg events — rare and bounded by
  * chain behavior, not data volume (same boundedness argument as the
  * bundle manifest in [[VidAssigner]]). They are collected to the
  * driver, turned into a literal sorted array, and the survival test
  * becomes a map-only higher-order-function expression over the full
  * log: NO shuffle, NO join — the 100 TB plan is a single scan. The
  * oracle twin recomputes the same set with a correlated anti-range
  * subquery in DuckDB, so two different algorithms must agree.
  */
object UndoCanonicalizer {

  /** `changes` must carry `block_num` and a delivery-order column
    * `seqCol`; `undos` must carry (`useq`, `last_valid`). Returns the
    * canonical subset of `changes`. */
  def canonicalize(spark: SparkSession, changes: DataFrame, undos: DataFrame,
                   seqCol: String = "block_num"): DataFrame = {
    val steps = stepTable(undos)
    if (steps.isEmpty) changes
    else {
      graft.plans.GraftExtensions.ensureRegistered(spark)
      // cut(seq) via the native binary-search kernel over the literal
      // step table ([[graft.functions.StepCut]]): one tree node at any
      // reorg count. The chained-CaseWhen twin ([[cutCaseWhen]],
      // spec-pinned equal) generates a branch per step and overflows
      // Janino past a few hundred steps — at sf1's 10x reorg volume the
      // whole stage silently fell back to interpreted eval.
      val cut = call_function("graft_step_cut", col(seqCol).cast("long"),
        typedLit(steps.flatMap { case (useq, sm) => Seq(useq, sm) }))
      changes.filter(cut.isNull || col("block_num") <= cut)
    }
  }

  /** Sorted, collapsed (boundary, suffix-min) step table of the undo
    * set — bounded by reorg count, not corpus size (documented above). */
  private def stepTable(undos: DataFrame): Seq[(Long, Long)] = {
    val u = undos.select(col("useq"), col("last_valid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    if (u.isEmpty) Seq.empty
    else {
      // cut(seq) = min last_valid over undos with useq > seq — a step
      // function of seq: suffix-min over the sorted undos, collapsed
      // to its breakpoints.
      val sufmin = u.scanRight(Long.MaxValue) { case ((_, lv), acc) =>
        math.min(lv, acc)
      }.init
      // a run of undos sharing one suffix-min collapses to its LARGEST
      // useq: for any seq below that boundary the first later undo lies
      // within the run, whose suffix-min is the shared value. (Keeping
      // the smallest useq instead would let seqs inside the run fall
      // through to the NEXT branch's larger cut — caught by the replay
      // property test.)
      u.map(_._1).zip(sufmin)
        .foldRight(List.empty[(Long, Long)]) {
          case ((useq, sm), acc) =>
            if (acc.headOption.exists(_._2 == sm)) acc
            else (useq, sm) :: acc
        }
    }
  }

  /** Chained-CaseWhen twin of the [[graft.functions.StepCut]] lookup —
    * retained so the spec can pin the kernel against the
    * built-in-operator formulation (and as documentation of why the
    * kernel exists: one generated branch per step). */
  private[graft] def cutCaseWhen(steps: Seq[(Long, Long)], seqCol: String): org.apache.spark.sql.Column = {
    require(steps.nonEmpty)
    steps.tail.foldLeft(
      when(col(seqCol) < steps.head._1, lit(steps.head._2))) {
      case (acc, (useq, sm)) => acc.when(col(seqCol) < useq, lit(sm))
    }
  }

  /** Step table accessor for the twin spec. */
  private[graft] def stepTableForSpec(undos: DataFrame): Seq[(Long, Long)] = stepTable(undos)
}
