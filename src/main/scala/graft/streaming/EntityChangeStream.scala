package graft.streaming

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
}
