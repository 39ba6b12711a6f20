package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 squash (SURVEY.md §2 #39).
  *
  * The reference's `run` stage consumes a live stream of entity changes
  * and maintains per-id current versions in memory, emitting closed
  * versions as updates arrive (reference sinker/sinker.go,
  * csvprocessor/processor.go:237-307). Structured-Streaming
  * re-expression: `groupByKey(id).flatMapGroupsWithState` — the state
  * store holds the open version per id (exactly the reference's
  * `map[id]*Entity`, but sharded across executors and checkpointed),
  * and each closed version is emitted in append mode as soon as the
  * closing change arrives.
  *
  * Scale: state is partitioned by id hash — the same key layout as the
  * batch SCD2 window — so a 1000-executor cluster shards the live-id
  * map instead of holding it on one process like the reference.
  */
object EntityChangeStream {

  case class Change(id: String, blockNum: Long, op: String, value: Double)
  case class OpenVersion(startBlock: Long, value: Double)
  case class Version(id: String, startBlock: Long, endBlock: Long, value: Double)

  /** A change CLOSES the open version (emitting it) and — unless it is
    * a DELETE — opens a new one. Mirrors processor.go:255-296. */
  def squash(id: String, changes: Iterator[Change],
             state: GroupState[OpenVersion]): Iterator[Version] = {
    val sorted = changes.toSeq.sortBy(_.blockNum)
    var open = state.getOption
    val out = Seq.newBuilder[Version]
    sorted.foreach { c =>
      open.foreach(o => out += Version(id, o.startBlock, c.blockNum, o.value))
      open = if (c.op == "DELETE") None else Some(OpenVersion(c.blockNum, c.value))
    }
    open match {
      case Some(o) => state.update(o)
      case None    => if (state.exists) state.remove()
    }
    out.result().iterator
  }

  /** Closed-version stream: one output row per version closed by a
    * later change. The still-open versions live in the state store
    * (the streaming analogue of `flushAllEntities` happens at query
    * stop / state inspection). */
  def closedVersions(changes: Dataset[Change]): Dataset[Version] = {
    implicit val oe = Encoders.product[OpenVersion]
    implicit val ve = Encoders.product[Version]
    changes
      .groupByKey(_.id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(squash)
  }

  /** A persisted store's LIVE row: an SCD2 version with no end block
    * (`[start,)` in the graph-CSV rendering). Input contract for the
    * seeded streams: AT MOST ONE live row per id — the SCD2 store
    * invariant itself (two open versions of one entity is a corrupt
    * store; Spark rejects duplicate initial-state keys rather than
    * silently picking one, which is the failure mode we want). */
  case class OpenRow(id: String, startBlock: Long, value: Double)

  /** RESUME-FROM-STORE bootstrap: the squash stream seeded with the
    * open versions of an existing store — batch SCD2's
    * `end_block IS NULL` rows, or a bundle-store read
    * ([[graft.sources.GraphCsvReader]]) filtered to its `[start,)`
    * rows. A restarted sink continues exactly where the store left
    * off: the first change for a known id CLOSES the store's live
    * version (emitting it) instead of silently starting history over
    * — the streaming analogue of the reference loader resuming from
    * its bundle ranges rather than block 0 (inject_csv.go:305-340).
    *
    * Scale: the initial state loads through the same id-hash
    * partitioning as the state store itself — one co-partitioned
    * pass, no driver materialization; thereafter identical to
    * [[closedVersions]]. Gated by the handshake spec: prefix-batch
    * SCD2 + bootstrapped stream over the suffix ==
    * full-history SCD2, closed row for closed row. */
  def closedVersionsFrom(changes: Dataset[Change],
                         open: Dataset[OpenRow]): Dataset[Version] = {
    implicit val oe = Encoders.product[OpenVersion]
    implicit val ve = Encoders.product[Version]
    val init = open.groupByKey(_.id)(Encoders.STRING)
      .mapValues(r => OpenVersion(r.startBlock, r.value))
    changes
      .groupByKey(_.id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout(), init)(squash)
  }

  // -------------------------------------------------------------------
  // Undo / reorg path (SURVEY.md §2 #39b)
  //
  // The reference sinker refuses undo signals outright — it demands a
  // final-blocks-only stream (reference sinker/sinker.go:291-293,
  // handleBlockUndoSignal returns an error) — which forces the whole
  // pipeline to lag the chain head by the finality delay. The streaming
  // re-expression handles reorgs instead of excluding them:
  //
  //   - delivery order is modeled by `seq` (the reference's stream
  //     cursor): a re-delivered canonical block after an undo has a
  //     LOWER block number but a HIGHER seq;
  //   - event time is the block number (1 block = 1s); the watermark
  //     delay IS the reorg threshold (graph-node's REORG_THRESHOLD):
  //     versions are emitted append-only once their close block is
  //     final, everything shallower stays in the state store where an
  //     undo can still rewrite it;
  //   - an `UNDO` record (op="UNDO", blockNum=last VALID block B)
  //     discards state segments that started above B and re-opens the
  //     version that was live at B. The source fans the global
  //     BlockUndoSignal out per entity id — it knows exactly which ids
  //     it delivered changes for above B, so the fan-out is bounded by
  //     the undone blocks' change count, not the corpus.
  //
  // Scale: state per id = open version + closed versions above the
  // finality horizon, i.e. O(changes per id within the reorg window) —
  // bounded by chain behavior, not by history. Sharded by id hash like
  // the batch SCD2 shuffle.
  // -------------------------------------------------------------------

  case class SeqChange(id: String, seq: Long, blockNum: Long, op: String,
                       value: Double, ts: Timestamp)
  /** One version segment held in state; `endBlock` None while open. */
  case class Segment(startBlock: Long, value: Double, endBlock: Option[Long])
  /** `floor` is the per-key rollback floor: the seeded store head's
    * start block for resumed keys (0 for keys first seen live). Store
    * rows are final by construction, so no undo may roll state back
    * below it — [[squashWithUndo]] clamps undo signals to this floor,
    * making the store-head invariant guard-enforced rather than an
    * input-contract assumption (the watermark alone cannot protect the
    * seed: at resume the watermark restarts at 0). */
  case class ReorgState(segments: Seq[Segment], floor: Long = 0L)

  /** Event-time encoding: block N = N seconds since epoch. */
  def blockTs(blockNum: Long): Timestamp = new Timestamp(blockNum * 1000L)

  /** Fan a global undo signal (roll back above `lastValidBlock`) out to
    * the ids the source delivered changes for above that block. */
  def undoFor(ids: Seq[String], seq: Long, lastValidBlock: Long): Seq[SeqChange] =
    ids.map(id => SeqChange(id, seq, lastValidBlock, "UNDO", 0.0, blockTs(lastValidBlock)))

  /** Per-id reorg-aware squash. Changes apply in delivery (`seq`) order;
    * segments whose close block has passed the watermark are emitted and
    * dropped; an UNDO rewrites only what is still in state. */
  def squashWithUndo(id: String, changes: Iterator[SeqChange],
                     state: GroupState[ReorgState]): Iterator[Version] = {
    val finalBlock = state.getCurrentWatermarkMs() / 1000L
    val prior = state.getOption
    var segs = prior.map(_.segments.toVector).getOrElse(Vector.empty)
    val floor = prior.map(_.floor).getOrElse(0L)
    // explicit late-row guard (flatMapGroupsWithState does not drop
    // late data): a change at-or-below the finality horizon, or an
    // undo rolling back BELOW it, would rewrite versions already
    // emitted append-only. The cursor contract forbids such
    // deliveries; enforce it here. An undo to exactly the horizon
    // (discard everything non-final) is legitimate.
    changes.filter(c => c.blockNum > finalBlock ||
        (c.op == "UNDO" && c.blockNum >= finalBlock))
      .toSeq.sortBy(_.seq).foreach { c =>
      if (c.op == "UNDO") {
        // clamp to the per-key floor: the seeded store head is final, so
        // an undo below it rolls back only to the head, never through it
        val b = math.max(c.blockNum, floor)
        segs = segs.filter(_.startBlock <= b).map { s =>
          if (s.endBlock.exists(_ > b)) s.copy(endBlock = None) else s
        }
      } else {
        segs = segs.map(s => if (s.endBlock.isEmpty) s.copy(endBlock = Some(c.blockNum)) else s)
        if (c.op != "DELETE") segs = segs :+ Segment(c.blockNum, c.value, None)
      }
    }
    val (fin, keep) = segs.partition(_.endBlock.exists(_ <= finalBlock))
    if (keep.nonEmpty) {
      state.update(ReorgState(keep, floor))
      // wake this key when its earliest pending close becomes final, so
      // idle ids still flush as the watermark advances
      keep.flatMap(_.endBlock).sorted.headOption.foreach { e =>
        state.setTimeoutTimestamp(math.max(e * 1000L, state.getCurrentWatermarkMs() + 1L))
      }
    } else if (state.exists) state.remove()
    fin.sortBy(_.startBlock)
      .map(s => Version(id, s.startBlock, s.endBlock.get, s.value)).iterator
  }

  /** Reorg-aware closed-version stream: append-only output of versions
    * whose close block is at least `reorgThresholdBlocks` behind the
    * newest delivered block. Anything shallower is mutable state that an
    * undo signal can roll back, so a reorg never corrupts emitted rows. */
  def closedVersionsWithUndo(changes: Dataset[SeqChange],
                             reorgThresholdBlocks: Long): Dataset[Version] = {
    implicit val se = Encoders.product[ReorgState]
    implicit val ve = Encoders.product[Version]
    changes
      .withWatermark("ts", s"$reorgThresholdBlocks seconds")
      .groupByKey(_.id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(squashWithUndo)
  }

  /** [[closedVersionsFrom]] for the reorg-aware path — the resume a
    * PRODUCTION deployment actually runs: each store live row becomes
    * one open segment of initial [[ReorgState]]. The store's rows are
    * final by construction (they were emitted behind the reorg
    * horizon, or loaded by the batch pipeline over final blocks), so
    * an UNDO may roll back anything delivered AFTER the resume but
    * never below the store head. This is GUARD-ENFORCED, not assumed:
    * each seeded key carries its store-head start as a rollback floor
    * in [[ReorgState]], and [[squashWithUndo]] clamps undo signals to
    * it (the watermark restarts at 0 on resume, so the late-row guard
    * alone cannot protect the seed). Gated by the handshake spec with
    * undo traps inside the resumed suffix, including an undo aimed
    * below the store head. */
  def closedVersionsWithUndoFrom(changes: Dataset[SeqChange],
                                 reorgThresholdBlocks: Long,
                                 open: Dataset[OpenRow]): Dataset[Version] = {
    implicit val se = Encoders.product[ReorgState]
    implicit val ve = Encoders.product[Version]
    val init = open.groupByKey(_.id)(Encoders.STRING)
      .mapValues(r => ReorgState(Seq(Segment(r.startBlock, r.value, None)), r.startBlock))
    changes
      .withWatermark("ts", s"$reorgThresholdBlocks seconds")
      .groupByKey(_.id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout(), init)(squashWithUndo)
  }
}
