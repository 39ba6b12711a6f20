package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WavCodec

/** RIFF/WAVE codec vectors: the byte layout pinned by hand (not
  * relative to the encoder), round-trip identity, the chunk-walking
  * behaviors that distinguish a real parser from an offset-44 peek,
  * and loud refusal on every structural-damage class a 100 TB ingest
  * actually sees. */
class WavSpec extends AnyFunSuite {

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def ascii(s: String) = s.getBytes("US-ASCII")

  test("encode: hand-pinned byte layout for a 4-sample 8-bit mono file") {
    val got = WavCodec.encode(Array[Byte](1, 2, 3, 4), 8000, 1, 8)
    val want =
      ascii("RIFF") ++ le32(4 + 24 + 8 + 4) ++ ascii("WAVE") ++
        ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8) ++
        ascii("data") ++ le32(4) ++ Array[Byte](1, 2, 3, 4)
    assert(got.toSeq === want.toSeq)
  }

  test("encode: odd-length data gets the mandated pad byte, excluded from the size") {
    val got = WavCodec.encode(Array[Byte](9, 8, 7), 16000, 2, 16)
    assert(got.length % 2 === 0)
    // declared data size is 3; the file carries 4 bytes after the header
    val dataIdx = got.indexOfSlice(ascii("data"))
    assert(got.slice(dataIdx + 4, dataIdx + 8).toSeq === le32(3).toSeq)
    assert(got.last === 0)
    // RIFF size covers the pad: 8 + riffSize == file length
    val riffSize = java.nio.ByteBuffer.wrap(got, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(8 + riffSize === got.length)
  }

  test("parse: round-trips every encoder parameter combination") {
    for {
      rate <- Seq(8000, 22050, 48000)
      channels <- Seq(1, 2)
      bits <- Seq(8, 16)
      n <- Seq(0, 1, 7, 256)
      list <- Seq(false, true)
    } {
      val samples = Array.tabulate(n)(i => (i * 37).toByte)
      val meta = WavCodec.parse(
        WavCodec.encode(samples, rate, channels, bits, list)).toOption.get
      assert(meta.sampleRate === rate)
      assert(meta.channels === channels)
      assert(meta.bitsPerSample === bits)
      assert(meta.dataBytes === n)
      assert(meta.nSamples === n.toLong / (channels * bits / 8))
      assert(meta.durationMs === meta.nSamples * 1000L / rate)
    }
  }

  test("parse: walks past unknown chunks (LIST before data) — not an offset-44 peek") {
    val plain = WavCodec.encode(Array[Byte](1, 2), 8000, 1, 8)
    val listed = WavCodec.parse(WavCodec.encode(Array[Byte](1, 2), 8000, 1, 8,
      withListChunk = true)).toOption.get
    assert(WavCodec.parse(plain).toOption.get === listed)
  }

  test("parse: odd-sized unknown chunk is skipped WITH its pad byte") {
    // hand-build: RIFF [ junk(size 3 + pad) | fmt | data ]
    val junk = ascii("junk") ++ le32(3) ++ Array[Byte](5, 5, 5, 0)
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)
    val data = ascii("data") ++ le32(2) ++ Array[Byte](1, 2)
    val body = ascii("WAVE") ++ junk ++ fmt ++ data
    val file = ascii("RIFF") ++ le32(body.length) ++ body
    val meta = WavCodec.parse(file).toOption.get
    assert(meta.dataBytes === 2 && meta.sampleRate === 8000)
  }

  test("parse: refusals name the first structural violation") {
    def err(bytes: Array[Byte]): String = WavCodec.parse(bytes).swap.toOption.get
    assert(err(Array.emptyByteArray).contains("too short"))
    assert(err(null).contains("too short"))
    assert(err(ascii("RIFX") ++ new Array[Byte](8)).contains("missing RIFF"))
    // RIFF size overruns the actual payload
    assert(err(ascii("RIFF") ++ le32(1000) ++ ascii("WAVE"))
      .contains("exceeds payload"))
    val ok = WavCodec.encode(Array[Byte](1, 2), 8000, 1, 8)
    // corrupt the form type
    val badForm = ok.clone(); ascii("AVI ").copyToArray(badForm, 8)
    assert(err(badForm).contains("missing WAVE"))
    // truncate mid-data: chunk size overruns the envelope...
    // (truncating the ARRAY makes the RIFF size itself overrun first)
    assert(err(ok.dropRight(1)).contains("exceeds payload"))
    // ...corrupting the data size upward overruns the envelope directly
    val badSize = ok.clone()
    le32(99).copyToArray(badSize, ok.indexOfSlice(ascii("data")) + 4)
    assert(err(badSize).contains("overruns RIFF envelope"))
    // non-PCM format code is refused, not misread
    val nonPcm = ok.clone()
    le16(3).copyToArray(nonPcm, ok.indexOfSlice(ascii("fmt ")) + 8)
    assert(err(nonPcm).contains("unsupported audio format 3"))
    // data before fmt is a structural violation
    val fmt = ascii("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(8000) ++ le16(1) ++ le16(8)
    val data = ascii("data") ++ le32(2) ++ Array[Byte](1, 2)
    val flipped = ascii("WAVE") ++ data ++ fmt
    assert(err(ascii("RIFF") ++ le32(flipped.length) ++ flipped)
      .contains("data chunk before fmt"))
    // a file that simply never has a data chunk
    val noData = ascii("WAVE") ++ fmt
    assert(err(ascii("RIFF") ++ le32(noData.length) ++ noData)
      .contains("no data chunk"))
    // zero channels would divide by zero downstream — refused at parse
    val zeroCh = ok.clone()
    le16(0).copyToArray(zeroCh, ok.indexOfSlice(ascii("fmt ")) + 10)
    assert(err(zeroCh).contains("invalid PCM params"))
  }

  test("parse: chunk size near Int.MaxValue cannot wrap the overrun check") {
    // a crafted size like 0x7FFFFFF0 overflows `position + size` in
    // Int arithmetic (negative → passes a naive check, then either
    // fabricates a data read or throws from position(negative)); the
    // walker compares in Long and must refuse with the Left contract
    def craft(id: String): Array[Byte] = {
      val chunk = ascii(id) ++ le32(0x7FFFFFF0)
      val body = ascii("WAVE") ++ chunk
      ascii("RIFF") ++ le32(body.length) ++ body
    }
    for (id <- Seq("junk", "data", "fmt ")) {
      val got = WavCodec.parse(craft(id))
      assert(got.isLeft && got.swap.toOption.get.contains("overruns RIFF envelope"), id)
    }
  }
}
