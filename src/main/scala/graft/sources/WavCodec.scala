package graft.sources

/** Minimal RIFF/WAVE codec — a REAL public container format parsed
  * from real bytes (the round-10 upgrade of the mm family's declared
  * byte-stub decode; see SURVEY.md §2 #38). The format is the public
  * Microsoft/IBM RIFF spec: little-endian sizes, 4-byte chunk tags,
  * chunks padded to even offsets, a `fmt ` chunk carrying the PCM
  * parameters and a `data` chunk carrying samples.
  *
  * The WRITE side ([[encode]]) exists so the engine can wrap raw
  * sample bytes into a canonical container (and so the test corpus's
  * payloads are genuine WAV files); the READ side ([[parse]]) is a
  * strict chunk-walker: it validates magics, walks chunk-by-chunk
  * honoring the odd-size pad rule, requires a PCM `fmt ` before
  * `data`, and fails loudly (Left) on structural damage rather than
  * guessing — the contract a 100 TB ingest wants from a header
  * parser (bad files route to a quarantine column, never a crash).
  */
object WavCodec {

  /** Parsed header facts — everything below comes from the BYTES, not
    * from metadata columns. */
  final case class WavMeta(
    sampleRate: Int, channels: Int, bitsPerSample: Int,
    dataBytes: Int, nSamples: Long, durationMs: Long)

  /** Render PCM sample bytes as a canonical WAV container.
    * `withListChunk` inserts a `LIST`/INFO chunk BEFORE `data` — real
    * encoders do, and it keeps the parser honest (fixed-offset-44
    * readers break on it). Odd-length data gets the mandated pad byte
    * (excluded from the chunk's declared size). */
  def encode(samples: Array[Byte], sampleRate: Int, channels: Int,
             bitsPerSample: Int, withListChunk: Boolean = false): Array[Byte] = {
    require(channels > 0 && bitsPerSample % 8 == 0 && bitsPerSample > 0,
      s"invalid PCM params: channels=$channels bits=$bitsPerSample")
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val listBody = "INFO".getBytes("US-ASCII") // minimal LIST payload
    val listLen = if (withListChunk) 8 + listBody.length else 0
    val pad = samples.length % 2
    val riffSize = 4 + (8 + 16) + listLen + (8 + samples.length + pad)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // audioFormat = PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    if (withListChunk)
      out.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    out.put("data".getBytes("US-ASCII")).putInt(samples.length).put(samples)
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  /** Strict chunk-walking parse. Left = a human-readable refusal
    * naming the FIRST structural violation; Right = facts read from
    * the `fmt ` and `data` chunk headers. Unknown chunks are skipped
    * (with the odd-size pad), which is what makes this a real RIFF
    * walker rather than an offset-44 peek. */
  def parse(bytes: Array[Byte]): Either[String, WavMeta] = {
    if (bytes == null || bytes.length < 12)
      return Left(s"too short for a RIFF header: ${if (bytes == null) -1 else bytes.length} bytes")
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); b.get(t); new String(t, "US-ASCII")
    }
    if (tag() != "RIFF") return Left("missing RIFF magic")
    val riffSize = b.getInt
    if (riffSize < 4 || 8L + riffSize > bytes.length)
      return Left(s"RIFF size $riffSize exceeds payload ${bytes.length}")
    if (tag() != "WAVE") return Left("missing WAVE form type")

    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    val end = 8 + riffSize
    while (b.position() + 8 <= end) {
      val id = tag()
      val size = b.getInt
      // compare in Long: a crafted size near Int.MaxValue would wrap
      // `position + size` negative, pass an Int check, and then either
      // fabricate a data chunk or throw from position(negative) —
      // breaking the parse-never-throws Left contract
      if (size < 0 || b.position().toLong + size > end)
        return Left(s"chunk '$id' size $size overruns RIFF envelope")
      id match {
        case "fmt " =>
          if (size < 16) return Left(s"fmt chunk too small: $size")
          val audioFormat = b.getShort & 0xFFFF
          if (audioFormat != 1)
            return Left(s"unsupported audio format $audioFormat (PCM=1 only)")
          val channels = b.getShort & 0xFFFF
          val rate = b.getInt
          b.getInt // byteRate (derived — not trusted)
          b.getShort // blockAlign (derived — not trusted)
          val bits = b.getShort & 0xFFFF
          if (channels == 0 || bits == 0 || bits % 8 != 0)
            return Left(s"invalid PCM params: channels=$channels bits=$bits")
          // skip any fmt extension + the odd-size pad; a FINAL chunk
          // may legally lack its pad byte, so clamp to the envelope
          b.position(math.min(b.position().toLong + (size - 16) + (size % 2), end.toLong).toInt)
          fmt = Some((rate, channels, bits))
        case "data" =>
          fmt match {
            case None => return Left("data chunk before fmt chunk")
            case Some((rate, channels, bits)) =>
              val blockAlign = channels * bits / 8
              val n = size.toLong / blockAlign
              val durMs = if (rate > 0) n * 1000L / rate else 0L
              return Right(WavMeta(rate, channels, bits, size, n, durMs))
          }
        case _ =>
          // skip + pad, clamped: a final odd chunk may lack its pad
          b.position(math.min(b.position().toLong + size + (size % 2), end.toLong).toInt)
      }
    }
    Left(if (fmt.isEmpty) "no fmt chunk in RIFF envelope" else "no data chunk in RIFF envelope")
  }
}
