package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 #38; metadata hash-gated).
  *
  * Pattern for image/audio/video at 100 TB: the payload is an opaque
  * `binary` column with a typed metadata struct; decode/feature-extract
  * runs per-partition so decoder state is initialized once per
  * partition, not per row. TWO real container decodes anchor the
  * family: mm_binary_meta walks genuine RIFF/WAVE chunks
  * ([[graft.sources.WavCodec]], round 10) and mm_resize / mm_phash /
  * mm_phash_dedup operate on pixels decoded by a strict BMP parser
  * ([[graft.sources.BmpCodec]], round 12). Only the VIDEO keys
  * (mm_frame_sample / mm_scene_cut) still read features from raw
  * payload bytes — a real video codec is out of scope for this
  * environment and their value is the fan-out/segmentation plumbing,
  * which is real and plan-gated.
  */
object Multimodal {

  /** Output schema of the WAV header extractor — every field except
    * doc_id/source is read from the container BYTES by the parser. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("source", StringType, nullable = true)
  ))

  /** Deterministic per-doc PCM parameters for the container build —
    * varied so the parse output isn't constant (and the oracle must
    * reproduce the same variation): rate ∈ {8k,12k,…,24k}, mono or
    * stereo, 8- or 16-bit. */
  def wavParams(docId: Long): (Int, Int, Int) = {
    val rate = 8000 + (docId % 5).toInt * 4000
    val channels = 1 + (docId % 2).toInt
    val bits = 8 * (1 + (docId % 2).toInt)
    (rate, channels, bits)
  }

  /** #38 mm_binary_meta — REAL container decode (round 10; rounds 1-9
    * ran a declared byte-math stub): each document's bytes are wrapped
    * as PCM samples in a genuine RIFF/WAVE container
    * ([[graft.sources.WavCodec.encode]] — every third doc also carries
    * a LIST chunk so fixed-offset readers would break), and the
    * feature row comes from [[graft.sources.WavCodec.parse]] actually
    * WALKING the chunks: magics validated, unknown chunks skipped with
    * the odd-size pad rule, PCM params read from `fmt `, sample count
    * from `data`. `mapPartitions` keeps the build+parse in one pass
    * with zero per-row allocation beyond the container itself;
    * everything before/after stays columnar. Malformed-container
    * behavior (truncation, bad magic, non-PCM, overrunning chunk
    * sizes) is spec-gated in WavSpec — a real ingest routes those to
    * quarantine instead of crashing. */
  def mmBinaryMeta(s: SparkSession, d: String): DataFrame = {
    // null payloads are dropped, not decoded — mirrored by the oracles'
    // WHERE text IS NOT NULL (a NULL would otherwise NPE the decoder
    // on one engine and emit a NULL row on the other)
    val in = Tables.documents(s, d).filter(col("text").isNotNull).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(col("n_chars"), col("source"), col("lang")).as("meta"))

    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(FeatureSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getAs[Long]("doc_id")
        val (rate, channels, bits) = wavParams(id)
        val wav = graft.sources.WavCodec.encode(
          r.getAs[Array[Byte]]("payload"), rate, channels, bits,
          withListChunk = id % 3 == 0)
        val meta = graft.sources.WavCodec.parse(wav)
          .fold(err => throw new IllegalStateException(
            s"doc $id: self-encoded WAV failed to parse: $err"), identity)
        Row(id, wav.length, meta.sampleRate, meta.channels,
          meta.bitsPerSample, meta.nSamples, meta.durationMs,
          r.getAs[Row]("meta").getAs[String]("source"))
      }
    }(enc)
  }

  /** Frames sampled per "video" payload. */
  val FramesPerDoc = 4

  /** Output schema of the frame sampler. */
  val FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_offset", IntegerType, nullable = false),
    StructField("frame_feature", IntegerType, nullable = false)
  ))

  /** #38b mm_frame_sample — the frame-sampling shape: one payload row
    * fans out to `FramesPerDoc` evenly-spaced frames, decoded
    * per-partition. The real-world version hands each offset to a
    * video codec; the stub reads the byte at the offset. What's real:
    * the fan-out inside mapPartitions (no exploded shuffle of payload
    * copies — the payload is read once per partition and never
    * duplicated across rows), the offset math, and the typed output. */
  def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    val in = Tables.documents(s, d).filter(col("text").isNotNull).select(
      col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(FrameSchema)
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val id = r.getAs[Long]("doc_id")
        val step = math.max(payload.length / FramesPerDoc, 1)
        (0 until FramesPerDoc).iterator.collect {
          case i if i * step < payload.length =>
            val off = i * step
            Row(id, i, off, payload(off) & 0xff)
        }
      }
    }(enc)
  }

  /** Resize "resolution": output planes carry this many samples. */
  val ResizeTarget = 64

  /** Container width rule for wrapping a flat payload as a BMP: a
    * function of the byte length alone (content-deterministic, so the
    * SQL oracles can reproduce it), varied across {36..48} so the
    * 24-bit row stride exercises every 4-byte pad value (3w mod 4 ∈
    * {0,1,2,3} over the range). */
  def imageWidth(len: Int): Int = 36 + (len % 5) * 3

  /** Every third payload (by length) gets a header→pixel gap — real
    * files carry palettes/profiles there; keeps the parser honest. */
  def imageGap(len: Int): Boolean = len % 3 == 0

  /** Decode a payload through the REAL container path: wrap as a
    * canonical 24-bit BMP ([[graft.sources.BmpCodec.encode]] — width
    * by [[imageWidth]], letterboxed last row), then strictly parse it
    * back ([[graft.sources.BmpCodec.parse]]: magic/header/bounds
    * validation, bottom-up row un-flip, stride-pad skip, gray
    * recovery). The round trip is NOT an identity: the decoded plane
    * is the rectangular image (w·h ≥ len samples, ' '-letterboxed),
    * which is what the downstream pixel ops consume. */
  def decodeGray(payload: Array[Byte]): graft.sources.BmpCodec.BmpImage = {
    val bmp = graft.sources.BmpCodec.encode(
      payload, imageWidth(payload.length), withGap = imageGap(payload.length))
    graft.sources.BmpCodec.parse(bmp).fold(
      err => throw new IllegalStateException(s"self-encoded BMP failed to parse: $err"),
      identity)
  }

  /** Nearest-neighbor downsample of a flat sample plane to `target`
    * samples — the 1-D resample kernel [[mmResize]] applies to the
    * DECODED gray plane. (Pre-round-12 this ran directly on payload
    * bytes as the declared `stubResize`.) */
  def resamplePlane(plane: Array[Byte], target: Int): Array[Byte] =
    if (plane.length <= target) plane
    else Array.tabulate(target)(i => plane((i.toLong * plane.length / target).toInt))

  /** Output schema of the resizer — binary in, binary out, plus the
    * container geometry the decode READ from the header bytes. */
  val ResizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("orig_len", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("resized", BinaryType, nullable = false)
  ))

  /** #38c mm_resize — the payload-IN / payload-OUT transform shape
    * (image resize, audio resample, re-encode), operating on REAL
    * decoded pixel data since round 12: each payload round-trips
    * through the strict BMP codec ([[decodeGray]]) and the resample
    * runs on the DECODED gray plane — geometry (width/height) comes
    * from the parsed header bytes, not from metadata columns. Codec
    * init amortized per partition; output stays bounded
    * (≤ `ResizeTarget` samples/row) so shuffle/write planning can
    * rely on it. */
  def mmResize(s: SparkSession, d: String): DataFrame = {
    val in = Tables.documents(s, d).filter(col("text").isNotNull).select(
      col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(ResizeSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val img = decodeGray(payload)
        Row(r.getAs[Long]("doc_id"), payload.length, img.width, img.height,
          resamplePlane(img.gray, ResizeTarget))
      }
    }(enc)
  }

  /** Audio-style windowing: window width / hop in bytes (50% overlap). */
  val AudioWin = 32
  val AudioHop = 16

  /** Output schema of the windower — digests, not payload copies. */
  val AudioWindowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("win_idx", IntegerType, nullable = false),
    StructField("win_offset", IntegerType, nullable = false),
    StructField("win_len", IntegerType, nullable = false),
    StructField("win_md5", StringType, nullable = false)))

  /** #38d mm_audio_window — the fixed-size overlapping-window fan-out
    * every audio feature pipeline starts with (frame the waveform,
    * hand each window to the feature extractor): one payload row emits
    * ceil(len/hop) windows of `AudioWin` bytes every `AudioHop` bytes,
    * the tail windows short. Decoded per-partition like the rest of
    * the mm family; each window is emitted as offset math plus an md5
    * DIGEST of the actual bytes — the payload is read once per
    * partition, never copied per window, and the digest makes the
    * byte-level windowing hash-gateable cross-engine. */
  def mmAudioWindow(s: SparkSession, d: String): DataFrame = {
    val in = Tables.documents(s, d).filter(col("text").isNotNull).select(
      col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(AudioWindowSchema)
    in.mapPartitions { rows =>
      val dig = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val id = r.getAs[Long]("doc_id")
        Iterator.from(0).map(_ * AudioHop).takeWhile(_ < payload.length)
          .zipWithIndex.map { case (off, i) =>
            val len = math.min(AudioWin, payload.length - off)
            dig.reset()
            dig.update(payload, off, len)
            val d = dig.digest()
            val out = new Array[Char](32)
            var k = 0
            while (k < 16) {
              out(k * 2) = hex((d(k) >> 4) & 0xf)
              out(k * 2 + 1) = hex(d(k) & 0xf)
              k += 1
            }
            Row(id, i, off, len, new String(out))
          }
      }
    }(enc)
  }

  /** Perceptual-hash geometry: 64 dHash bits split into 4 bands of 16
    * for Hamming-banded candidate generation. */
  val PhashSamples = 64
  val PhashBands = 4
  val PhashBandBits: Int = PhashSamples / PhashBands

  /** Output schema of the fingerprinter — 4 band ints ARE the hash
    * (b3‖b2‖b1‖b0); kept as separate INTs so band-join keys need no
    * bit-slicing and the signed-shift corner of a packed BIGINT never
    * arises cross-engine. */
  val PhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("b0", IntegerType, nullable = false),
    StructField("b1", IntegerType, nullable = false),
    StructField("b2", IntegerType, nullable = false),
    StructField("b3", IntegerType, nullable = false)))

  /** BYTE-STUB perceptual hash (pre-round-12 kernel): 64 evenly-spaced
    * payload samples, bit i = sample(i) > sample((i+1) mod 64).
    * Retained as the hasher-agnostic input source for the
    * [[phashPairs]] miner specs (the miner's correctness doesn't
    * depend on WHICH 4×16-bit fingerprint feeds it); the production
    * fingerprint is [[phashOfPayload]], the real decoded-pixel dHash. */
  def stubPhash(payload: Array[Byte]): Array[Int] = {
    val n = payload.length
    val smp = Array.tabulate(PhashSamples)(i => payload(((i.toLong * n) / PhashSamples).toInt) & 0xff)
    Array.tabulate(PhashBands) { b =>
      var acc = 0
      var j = 0
      while (j < PhashBandBits) {
        val i = b * PhashBandBits + j
        if (smp(i) > smp((i + 1) % PhashSamples)) acc |= 1 << j
        j += 1
      }
      acc
    }
  }

  /** dHash grid: 9 columns × 8 rows of nearest-neighbor samples over
    * the decoded image; bit (r,c) = grid(r,c) > grid(r,c+1) — 8
    * gradient signs per row × 8 rows = 64 bits, packed into the same
    * 4×16-bit bands as always (bit i = r·8 + c, band i/16, offset
    * i%16). This is the REAL dHash geometry (difference hash over a
    * downscaled luminance grid), not a byte stub. */
  def dhash(img: graft.sources.BmpCodec.BmpImage): Array[Int] = {
    val sy = Array.tabulate(8)(r => r * img.height / 8)
    val sx = Array.tabulate(9)(c => c * img.width / 9)
    Array.tabulate(PhashBands) { b =>
      var acc = 0
      var j = 0
      while (j < PhashBandBits) {
        val i = b * PhashBandBits + j
        val r = i / 8
        val c = i % 8
        val a = img.gray(sy(r) * img.width + sx(c)) & 0xff
        val d = img.gray(sy(r) * img.width + sx(c + 1)) & 0xff
        if (a > d) acc |= 1 << j
        j += 1
      }
      acc
    }
  }

  /** Production fingerprint: strict container decode, then the real
    * grid dHash on the decoded pixels. Shared by the batch [[mmPhash]]
    * and the streaming [[graft.streaming.PhashDedupStream]] so stream
    * and batch indexes stay bit-compatible. */
  def phashOfPayload(payload: Array[Byte]): Array[Int] = dhash(decodeGray(payload))

  /** #38e mm_phash — per-payload perceptual fingerprint, the kernel an
    * image-dedup pipeline computes at ingest and stores in its index:
    * since round 12 a REAL decode → fixed-grid dHash chain
    * ([[phashOfPayload]]: strict BMP parse, 9×8 nearest-neighbor
    * luminance grid, adjacent-column gradient signs), run per
    * partition like the rest of the mm family. The dump IS the
    * per-doc hash table: map-only, hash-gated for every payload; the
    * Hamming pair-mining step over it is [[phashPairs]] (spec-gated
    * with planted near-identical payloads — the synthetic corpus has
    * no sub-threshold image pairs to mine, so the join's correctness
    * gate lives in the spec, the fingerprint math in the oracle). */
  def mmPhash(s: SparkSession, d: String): DataFrame = {
    val in = Tables.documents(s, d)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(PhashSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val h = phashOfPayload(r.getAs[Array[Byte]]("payload"))
        Row(r.getAs[Long]("doc_id"), h(0), h(1), h(2), h(3))
      }
    }(enc)
  }

  /** Near-duplicate payload pairs from a [[mmPhash]]-shaped frame:
    * candidates share at least one exact 16-bit band (one shuffle on
    * the band key — never all-pairs), then the exact popcount filter
    * keeps Hamming ≤ `maxHamming`. By pigeonhole the banding is
    * EXACT (recall 1.0) for maxHamming ≤ PhashBands − 1: ≤3 differing
    * bits cannot touch all 4 disjoint bands. Larger thresholds trade
    * recall for the same bounded cost — the standard LSH dial (same
    * contract as dd_minhash_lsh's band count). Band buckets on a
    * boilerplate-heavy corpus concentrate exact twins; compose with
    * dd_exact's md5-collapse first (the dd_cluster round-5 fix) when
    * twin cliques dominate. */
  def phashPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    val bands = hashed.select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("bi", "bv")))
    val ham = (0 to 3).map(i =>
        bit_count(col(s"a.b$i").bitwiseXOR(col(s"b.b$i"))))
      .reduce(_ + _)
    bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      // hamming is a pure function of the pair, so distinct over
      // (a_id, b_id, hamming) deduplicates multi-band collisions
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        ham.cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming budget for the GATED [[mmPhashDedup]] run. The synthetic
    * corpus plants no image twins (its phash space is dense-random —
    * closest banded pair sits at Hamming 18), so the oracle-gated dial
    * is opened to 20 to drive non-empty rows through the
    * band-collision + popcount path cross-engine; a real image-dedup
    * deployment runs ≤ [[PhashBands]]−1 = 3, the EXACT-recall regime
    * (pigeonhole — ≤3 differing bits cannot touch all 4 disjoint
    * bands), which is spec-pinned on planted near-identical payloads
    * ([[phashPairs]] spec). Both engines run the SAME banded
    * semantics, so the gate is bit-exact at any dial setting. */
  val PhashMaxHamming = 20

  /** #38g mm_phash_dedup — near-duplicate payload mining over the
    * perceptual-hash index: the step an image-curation pipeline runs
    * after [[mmPhash]] populates the fingerprint table (exact-crop
    * collapse, augmentation-twin removal before training). Candidates
    * share an exact 16-bit band (one shuffle on the band key — never
    * all-pairs), survivors pass the exact popcount filter. Output is
    * one row per near-dup pair with its Hamming distance.
    *
    * Scale: band buckets bound pair work the same way dd_minhash_lsh's
    * bands do — per-bucket |B|² with 16-bit buckets over a
    * content-skewed corpus stays bounded once exact twins are collapsed
    * first (compose with dd_exact's md5-collapse when twin cliques
    * dominate, the documented dd_cluster recipe). */
  def mmPhashDedup(s: SparkSession, d: String): DataFrame =
    phashPairs(mmPhash(s, d), PhashMaxHamming)

  /** Scene-cut threshold on the stub frame feature: consecutive-frame
    * feature deltas ≥ this start a new scene. On the byte-feature stub
    * 32 separates letter↔letter deltas (<26) from letter↔space jumps —
    * a real pipeline puts its frame-histogram distance here. */
  val SceneTau = 32

  /** #38f mm_scene_cut — scene segmentation, the step after frame
    * sampling in every video curation pipeline (shot boundaries drive
    * clip extraction, caption alignment, and per-scene dedup). A scene
    * starts where the inter-frame feature delta jumps ≥ [[SceneTau]];
    * the output is one row per (doc, scene) with its frame span and
    * feature envelope — bounded by frames, usually far fewer.
    *
    * Spark-first: lag + running-sum windows over (doc_id ORDER BY
    * frame_idx), then a per-(doc, scene) aggregate. ONE shuffle total:
    * both windows and the final agg cluster on doc_id, and
    * HashPartitioning(doc_id) satisfies the (doc_id, scene_id)
    * clustering, so EnsureRequirements inserts no second exchange
    * (plan-gated). Frames per payload are bounded (codec sampling
    * rate), so per-doc window state is bounded at any corpus size. */
  def mmSceneCut(s: SparkSession, d: String): DataFrame =
    sceneCut(mmFrameSample(s, d))

  /** The segmentation over any frames frame — split out for specs. */
  private[graft] def sceneCut(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames
      .withColumn("prev", lag(col("frame_feature"), 1).over(w))
      .withColumn("cut", when(col("prev").isNull ||
        abs(col("frame_feature") - col("prev")) >= SceneTau, 1).otherwise(0))
      .withColumn("scene_id", sum(col("cut")).over(run))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(min(col("frame_idx")).as("first_frame"),
        count(lit(1)).as("n_frames"),
        min(col("frame_feature")).as("f_min"),
        max(col("frame_feature")).as("f_max"))
  }

  /** #38c dumped form: the binary-out transform (`mmResize`) projected
    * to hash-gated metadata + an md5 digest OF the resampled pixel
    * bytes. The digest rides through the actual decode→resample path,
    * so the oracle verifies the decoded-pixel math cross-engine
    * without shipping a blob column through the stringified compare. */
  def mmResizeDigest(s: SparkSession, d: String): DataFrame =
    mmResize(s, d).select(
      col("doc_id"),
      col("orig_len"),
      col("width"),
      col("height"),
      length(col("resized")).as("resized_len"),
      md5(col("resized")).as("resized_md5"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_audio_window" -> (mmAudioWindow _),
    "mm_resize" -> (mmResizeDigest _),
    "mm_phash" -> (mmPhash _),
    "mm_phash_dedup" -> (mmPhashDedup _),
    "mm_scene_cut" -> (mmSceneCut _)
  )

  /** Every mm decode is deterministic — the video stubs by
    * construction, the WAV/BMP paths because the containers are built
    * from the doc bytes by documented rules (so the decoded facts are
    * pure functions of the payload) — and therefore the outputs ARE
    * SQL-expressible: the oracles recompute header fields / decoded
    * planes / grid samples / digests from the same UTF-8 payload bytes
    * in DuckDB (documents.text is ASCII in the testdata, so character
    * position == byte offset, md5(VARCHAR) == md5 of the payload, and
    * the BMP gray plane is rpad(text, w·h, ' ')). This keeps all mm
    * keys at rows+schema+hash EVEN THOUGH the Spark side runs real
    * container walks. */
  val oracles: Map[String, String] = Map(
    // recomputes what the RIFF walker READ from the container bytes:
    // byte_len = 12 RIFF hdr + 24 fmt + (12 LIST on every 3rd doc) +
    // 8 data hdr + samples + odd pad; PCM params from the documented
    // per-doc rule; n_samples = data bytes / blockAlign where
    // blockAlign = channels*bits/8 = (1+m)^2 for m = doc_id%2
    "mm_binary_meta" ->
      """SELECT doc_id,
        |  CAST(44 + CASE WHEN doc_id % 3 = 0 THEN 12 ELSE 0 END
        |       + length(text) + length(text) % 2 AS INT) AS byte_len,
        |  CAST(8000 + (doc_id % 5) * 4000 AS INT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(8 * (1 + doc_id % 2) AS INT) AS bits,
        |  CAST(length(text) // ((1 + doc_id % 2) * (1 + doc_id % 2)) AS BIGINT) AS n_samples,
        |  CAST((length(text) // ((1 + doc_id % 2) * (1 + doc_id % 2)))
        |       * 1000 // (8000 + (doc_id % 5) * 4000) AS BIGINT) AS duration_ms,
        |  source
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "mm_audio_window" ->
      """SELECT d.doc_id,
        |       CAST(t.i AS INT) AS win_idx,
        |       CAST(t.i * 16 AS INT) AS win_offset,
        |       CAST(least(32, length(d.text) - t.i * 16) AS INT) AS win_len,
        |       md5(substr(d.text, t.i * 16 + 1, 32)) AS win_md5
        |FROM documents d
        |-- lateral per-row window count: the oracle enumerates exactly
        |-- the windows the (unbounded) Spark operator emits for ANY
        |-- document length — no silent data-size cap in the gate
        |CROSS JOIN LATERAL (
        |  SELECT unnest(range(0, (length(d.text) + 15) // 16)) AS i) t
        |WHERE d.text IS NOT NULL AND t.i * 16 < length(d.text)""".stripMargin,
    "mm_frame_sample" ->
      """SELECT d.doc_id,
        |       t.i AS frame_idx,
        |       t.i * greatest(length(d.text) // 4, 1) AS frame_offset,
        |       ascii(substr(d.text, t.i * greatest(length(d.text) // 4, 1) + 1, 1)) AS frame_feature
        |FROM documents d
        |CROSS JOIN range(0, 4) t(i)
        |WHERE d.text IS NOT NULL
        |  AND t.i * greatest(length(d.text) // 4, 1) < length(d.text)""".stripMargin,
    "mm_scene_cut" ->
      """WITH frames AS (
        |  SELECT d.doc_id, CAST(t.i AS INT) AS frame_idx,
        |         ascii(substr(d.text, t.i * greatest(length(d.text) // 4, 1) + 1, 1)) AS f
        |  FROM documents d CROSS JOIN range(0, 4) t(i)
        |  WHERE d.text IS NOT NULL
        |    AND t.i * greatest(length(d.text) // 4, 1) < length(d.text)),
        |marked AS (
        |  SELECT doc_id, frame_idx, f,
        |    CASE WHEN lag(f) OVER w IS NULL
        |           OR abs(f - lag(f) OVER w) >= 32 THEN 1 ELSE 0 END AS cut
        |  FROM frames WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
        |scenes AS (
        |  SELECT doc_id, frame_idx, f,
        |    CAST(SUM(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_id
        |  FROM marked)
        |SELECT doc_id, scene_id, CAST(MIN(frame_idx) AS INT) AS first_frame,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(MIN(f) AS INT) AS f_min, CAST(MAX(f) AS INT) AS f_max
        |FROM scenes GROUP BY doc_id, scene_id""".stripMargin,
    // the decoded gray plane of the self-encoded BMP is the payload
    // letterboxed to the w×h rectangle: rpad(text, w·h, ' ') — the
    // oracle recomputes geometry from the SAME width rule the encoder
    // uses and resamples the PLANE, verifying the whole
    // encode→parse→resample chain cross-engine
    "mm_resize" ->
      """WITH g AS (
        |  SELECT doc_id, text, length(text) AS len,
        |         CAST(36 + (length(text) % 5) * 3 AS INT) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |i AS (
        |  SELECT doc_id, text, len, w,
        |         CAST(greatest((len + w - 1) // w, 1) AS INT) AS h
        |  FROM g),
        |p AS (
        |  SELECT doc_id, len, w, h, w * h AS n,
        |         rpad(text, CAST(w * h AS INT), ' ') AS px
        |  FROM i)
        |SELECT doc_id,
        |       CAST(len AS INT) AS orig_len,
        |       w AS width, h AS height,
        |       CAST(least(n, 64) AS INT) AS resized_len,
        |       md5(CASE WHEN n <= 64 THEN px
        |           ELSE list_aggregate(list_transform(range(0, 64), i ->
        |                  substr(px, CAST(i * n // 64 AS INT) + 1, 1)),
        |                'string_agg', '')
        |           END) AS resized_md5
        |FROM p""".stripMargin,
    "mm_phash_dedup" ->
      s"""$phashHashSql,
        |bands AS (
        |  SELECT doc_id, b0, b1, b2, b3, t.bi,
        |    CASE t.bi WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2 ELSE b3 END AS bv
        |  FROM h CROSS JOIN range(0, 4) t(bi))
        |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        |     + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS INT) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= $PhashMaxHamming""".stripMargin,
    "mm_phash" ->
      s"""$phashHashSql
        |SELECT doc_id, b0, b1, b2, b3 FROM h""".stripMargin
  )

  /** One dHash band as DuckDB SQL over the decoded plane `px` (w×h):
    * bit j of band `b` is grid sample (r,c) > (r,c+1) for global bit
    * index i = b·16+j, r = i/8, c = i%8, with nearest-neighbor grid
    * coords sy(r) = r·h/8, sx(c) = c·w/9 — the EXACT integer math of
    * [[dhash]]. Generated, not hand-typed: 8 substr positions per
    * band invite transcription bugs. */
  private def phashBandSql(b: Int): String = {
    val i = s"($b*16+j)"
    def pos(cExpr: String) =
      s"CAST((($i//8) * h) // 8 AS INT) * w + CAST(($cExpr * w) // 9 AS INT) + 1"
    s"""CAST(list_sum(list_transform(range(0, 16), j ->
       |    CASE WHEN ascii(substr(px, ${pos(s"($i%8)")}, 1))
       |          > ascii(substr(px, ${pos(s"($i%8 + 1)")}, 1))
       |    THEN 1 << CAST(j AS INT) ELSE 0 END)) AS INT) AS b$b""".stripMargin
  }

  /** Shared WITH-chain for the phash oracles: geometry from the same
    * width rule the encoder uses, decoded plane = rpad(text, w·h, ' ')
    * (the BMP round trip's letterboxed gray plane), then the 4 bands
    * of the real grid dHash. */
  private lazy val phashHashSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, text, length(text) AS len,
       |         CAST(36 + (length(text) % 5) * 3 AS INT) AS w
       |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
       |geo AS (
       |  SELECT doc_id, text, len, w,
       |         CAST(greatest((len + w - 1) // w, 1) AS INT) AS h
       |  FROM g),
       |p AS (
       |  SELECT doc_id, w, h, rpad(text, CAST(w * h AS INT), ' ') AS px FROM geo),
       |h AS (
       |  SELECT doc_id,
       |  ${phashBandSql(0)},
       |  ${phashBandSql(1)},
       |  ${phashBandSql(2)},
       |  ${phashBandSql(3)}
       |  FROM p)""".stripMargin
}
