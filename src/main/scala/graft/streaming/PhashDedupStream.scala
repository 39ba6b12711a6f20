package graft.streaming

import graft.queries.Multimodal
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Streaming perceptual-hash near-dup alerting (SURVEY.md §2 #42i):
  * flag incoming payloads whose fingerprint collides with the standing
  * image index — the continuous arm of the batch `mm_phash_dedup` key
  * (an image-ingest pipeline fingerprints each arrival at decode time
  * and asks "have I trained on this picture?" before admitting it).
  *
  * Spark-first: a stream-static INNER equi-join, natively supported in
  * append mode with NO state store at all. The stream side
  * fingerprints its own micro-batch (the same `phashOfPayload`
  * decode→grid-dHash kernel the batch key runs — strict BMP parse,
  * real pixel grid — in the sanctioned mapPartitions codec shape),
  * explodes into 4 per-band rows, and probes the static band index on
  * the (band, value) key; the exact popcount budget rides as a
  * residual join predicate. One output row per (payload, reference,
  * COLLIDING BAND) — a pair colliding in several bands reports each
  * collision (at-least-once per pair, the alerting contract); the
  * batch key's DISTINCT collapse is a downstream aggregation choice,
  * and the spec pins set-of-pairs equality against [[Multimodal
  * .phashPairs]] on the same corpus.
  *
  * Scale: the reference index is 4 rows of (band, value, 4×16-bit
  * hash) per payload — ~48 B/row, billions of payloads fit a bucketed
  * table on the (bi, bv) key; storage-partitioned reads keep the
  * static side shuffle-free and the stream side only ever shuffles
  * its own micro-batch (same layout argument as
  * [[EmbedDedupStream]]). */
object PhashDedupStream {

  private val HashedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("b0", IntegerType, nullable = false),
    StructField("b1", IntegerType, nullable = false),
    StructField("b2", IntegerType, nullable = false),
    StructField("b3", IntegerType, nullable = false)))

  /** Fingerprint a (doc_id, payload) frame — batch or stream — with
    * the batch key's byte kernel. */
  def fingerprints(payloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(HashedSchema)
    payloads.mapPartitions { rows =>
      rows.map { r =>
        val h = Multimodal.phashOfPayload(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), h(0), h(1), h(2), h(3))
      }
    }(enc)
  }

  /** Reference-side projection: fingerprint once, band-explode once.
    * Built from a batch (doc_id, payload) frame and reused every
    * micro-batch — PERSISTED here so the build-once contract holds:
    * an unpersisted frame is lazy and every micro-batch would
    * re-fingerprint and re-explode the whole reference corpus (at
    * cluster scale the persisted index is instead a bucketed table on
    * (bi, bv), see the object doc). The caller releases it with
    * `unpersist()` when the query stops. */
  def referenceIndex(reference: DataFrame): DataFrame =
    fingerprints(reference)
      .select(col("doc_id").as("ref_id"),
        col("b0").as("rb0"), col("b1").as("rb1"),
        col("b2").as("rb2"), col("b3").as("rb3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("bi", "bv")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** `stream` needs (doc_id, payload binary); emits one append-only
    * row per (arriving payload, reference payload, colliding band)
    * within the Hamming budget: (doc_id, ref_id, band, hamming). */
  def collisions(stream: DataFrame, refIndex: DataFrame,
                 maxHamming: Int): DataFrame = {
    val probed = fingerprints(stream)
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("bi", "bv")))
    val ham = bit_count(col("b0").bitwiseXOR(col("rb0"))) +
      bit_count(col("b1").bitwiseXOR(col("rb1"))) +
      bit_count(col("b2").bitwiseXOR(col("rb2"))) +
      bit_count(col("b3").bitwiseXOR(col("rb3")))
    probed.join(refIndex,
        probed("bi") === refIndex("bi") && probed("bv") === refIndex("bv") &&
          probed("doc_id") =!= refIndex("ref_id") &&
          ham <= maxHamming)
      .select(probed("doc_id"), col("ref_id"),
        probed("bi").as("band"), ham.cast("int").as("hamming"))
  }
}
