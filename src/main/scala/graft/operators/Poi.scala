package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proof-of-indexing digests (SURVEY.md §2 #11, #12).
  *
  * The reference hashes each block's entity events in arrival order with
  * graph-node's "fast" stable hash, then mixes the previous block's poi
  * into the current one (reference poi/poi.go:33-73, stablehash/fast.go).
  * The hash function itself is an implementation detail of graph-node
  * compatibility; the engine-level semantics re-expressed here are:
  *
  *   - a per-block digest over the block's events that is SENSITIVE TO
  *     EVENT ORDER (poi.go:88-99 increments `vecLength` per event);
  *   - digests combined across blocks, again order-sensitively.
  *
  * Spark-first: `collect_list(struct(seq, repr))` + `array_sort` +
  * `array_join` + `md5` gives a deterministic ordered digest with ONE
  * shuffle per level; the reference's strictly sequential
  * block-to-block chain becomes a two-level digest tree (events→block,
  * blocks→bundle) so every level is parallel. A 1000-executor run
  * digests 100 TB of events with two hash-aggs; the serial chain would
  * be a single-threaded reduce.
  */
object Poi {

  /** Canonical event representation — decimal-cast so the text form is
    * engine-portable (doubles would format differently). */
  private val repr =
    concat(col("op"), lit(":"), col("id"), lit(":"),
      col("value").cast("decimal(20,2)").cast("string"))

  /** md5 over the `repr` column of rows grouped by `key`, ordered by
    * `ord` — the portable "ordered digest" primitive. */
  private def orderedDigest(df: DataFrame, key: String, ord: String, reprCol: String, sep: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        count(lit(1)).as("n"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col(ord), col(reprCol).as("r")))),
            x => x.getField("r")),
          sep)).as("digest")
      )

  /** #11 gl_poi_block_digest — per-block ordered digest.
    * `blockSize` events form one "block" (the synthetic stream has one
    * event per block_num; grouping keeps blocks non-trivial). */
  def blockDigest(changes: DataFrame, blockSize: Long): DataFrame =
    orderedDigest(
      changes.withColumn("block", expr(s"block_num div $blockSize"))
        .withColumn("r", repr),
      "block", "block_num", "r", "|")
      .select(col("block"), col("digest"), col("n").as("n_events"))

  /** #12 gl_poi_chain — block digests combined per bundle, ordered by
    * block: the parallel re-expression of poi.go:48-73's sequential
    * prev-mixing. Within a bundle the digest covers blocks in order;
    * bundles are independent → embarrassingly parallel. */
  def poiChain(changes: DataFrame, blockSize: Long, blocksPerBundle: Long): DataFrame =
    orderedDigest(
      blockDigest(changes, blockSize)
        .withColumn("bundle", expr(s"block div $blocksPerBundle")),
      "bundle", "block", "digest", "")
      .select(col("bundle"), col("digest").as("poi"), col("n").as("n_blocks"))
}
