package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — tx_pack's continuous form (SURVEY.md
  * §2 #34i): documents arriving on a stream are appended to fixed
  * token-budget training sequences the moment they arrive, instead of
  * waiting for a batch re-pack over the whole corpus.
  *
  * Policy: each shard keeps ONE cursor (its running token total) in
  * the state store; a micro-batch's docs are laid out in doc_id order
  * within their shard continuing from the cursor, and a doc belongs to
  * the sequence its first token lands in (the batch packer's
  * start-offset bin rule). Feeding the corpus in doc_id-ordered
  * batches therefore reproduces the batch layout EXACTLY — the spec
  * gates on that equivalence — while arbitrary arrival orders still
  * yield gapless, reproducible-per-arrival-order layouts.
  *
  * Scale: `text` is projected to a token count BEFORE the shuffle
  * (the batch packer's ~24 B/doc property), state is one long per
  * shard (bounded by construction — no watermark needed), and state
  * partitioning is by shard, so writer parallelism = shard count,
  * same as the batch form.
  */
object PackStream {

  case class Packed(doc_id: Long, shard: Long, n_tok: Long,
                    start_tok: Long, seq_in_shard: Long)
  private[streaming] case class Cursor(nextTok: Long)

  private def pack(budget: Long)(
      shard: Long, rows: Iterator[(Long, Long, Long)],
      state: GroupState[Cursor]): Iterator[Packed] = {
    var cursor = state.getOption.map(_.nextTok).getOrElse(0L)
    // rows.toSeq buffers ONE shard's slice of ONE micro-batch — at
    // most the whole micro-batch (the pathological all-docs-one-shard
    // case, spec-pinned) at ~24 B/row, since text was projected to a
    // count before the shuffle. Bounded by micro-batch sizing, never
    // by stream length; persistent state stays one long per shard.
    val out = rows.toSeq.sortBy(_._1).map { case (id, nTok, _) =>
      val start = cursor
      cursor += nTok
      Packed(id, shard, nTok, start, start / budget)
    }
    state.update(Cursor(cursor))
    out.iterator
  }

  /** Packed-sequence assignments for a streaming (doc_id, text) frame.
    * Emits one row per doc as it arrives (append mode). */
  def assignments(docs: DataFrame, shards: Int, budget: Long): Dataset[Packed] = {
    implicit val ce = Encoders.product[Cursor]
    implicit val pe = Encoders.product[Packed]
    val rowEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    docs
      // mirror the batch packer's input contract: a row with a null
      // doc_id or text cannot be packed, and a null n_tok would fail
      // the primitive tuple encoder at runtime mid-micro-batch
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        (col("doc_id") % shards).cast("long").as("shard"))
      .as[(Long, Long, Long)](rowEnc)
      .groupByKey(_._3)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(pack(budget))
  }
}
