package graft.sources

/** Minimal BMP (Windows bitmap) codec — the mm family's second REAL
  * public container format (round 12; WavCodec was round 10's): a
  * 14-byte BITMAPFILEHEADER, a 40-byte BITMAPINFOHEADER, an optional
  * header→pixel gap (real files carry palettes/profiles there), and a
  * bottom-up 24-bit BI_RGB pixel array whose rows are padded to
  * 4-byte boundaries — all little-endian, all from the public
  * Microsoft file-format documentation.
  *
  * The WRITE side ([[encode]]) wraps a grayscale byte plane into a
  * canonical container (each gray value becomes a B=G=R pixel, the
  * partial last row letterboxed with [[PadByte]]); the READ side
  * ([[parse]]) is a strict header-validating decoder: magics, header
  * size, plane/bpp/compression fields and the pixel-array bounds are
  * all checked against the actual byte length, rows are un-flipped
  * from the bottom-up storage order, stride padding is skipped, and
  * structural damage fails loudly (Left) rather than guessing — the
  * same quarantine-not-crash contract as [[WavCodec]]. Gray is
  * recovered as the integer mean (b+g+r)/3, exact on the equal-channel
  * pixels this encoder writes and a defensible luma for any other
  * 24-bit BMP.
  *
  * mm_resize / mm_phash route through THIS decode (encode → parse →
  * pixel ops), so their features are computed from real decoded pixel
  * data, not raw payload bytes — upgrading the round-11 "deterministic
  * byte stub" status the way mm_binary_meta's RIFF walk did for audio.
  */
object BmpCodec {

  /** Decoded image: `gray(r * width + c)` is row r, column c,
    * TOP-DOWN (parse un-flips the BMP's bottom-up storage). */
  final case class BmpImage(width: Int, height: Int, gray: Array[Byte])

  /** Letterbox fill for the partial last row — 0x20 so the decoded
    * plane of an ASCII payload is expressible as rpad(text, w·h, ' ')
    * in the SQL oracles. */
  val PadByte: Byte = ' '

  /** Refuse absurd dimensions before allocating w·h: a hostile header
    * may declare gigapixel bounds inside a 100-byte file (the bounds
    * check below would catch it, but only after the multiply — which
    * must therefore be overflow-safe too). */
  val MaxDim = 1 << 15
  val MaxPixels = 1 << 26

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >>> 8) & 0xFF).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
  }
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 3
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }
  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  /** Render a grayscale plane as a canonical 24-bit BMP. Height is
    * ceil(len/width), min 1 (an empty payload is one letterboxed
    * row — a zero-height BMP is invalid and [[parse]] refuses it).
    * `withGap` inserts 8 bytes of 0xCC between the headers and the
    * pixel array with bfOffBits pointing past them — real encoders
    * leave palettes/ICC profiles there, and it keeps fixed-offset-54
    * readers honest. */
  def encode(gray: Array[Byte], width: Int, withGap: Boolean = false): Array[Byte] = {
    require(width > 0 && width <= MaxDim, s"invalid width $width")
    val h = math.max((gray.length + width - 1) / width, 1)
    val stride = (3 * width + 3) / 4 * 4
    val gap = if (withGap) 8 else 0
    val offBits = 14 + 40 + gap
    val out = new Array[Byte](offBits + stride * h)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong) // bfSize
    putU32(out, 10, offBits.toLong)   // bfOffBits
    putU32(out, 14, 40L)              // biSize: BITMAPINFOHEADER
    putU32(out, 18, width.toLong)
    putU32(out, 22, h.toLong)         // positive: bottom-up rows
    putU16(out, 26, 1)                // biPlanes
    putU16(out, 28, 24)               // biBitCount
    putU32(out, 30, 0L)               // BI_RGB
    putU32(out, 34, (stride * h).toLong)
    putU32(out, 38, 2835L); putU32(out, 42, 2835L) // 72 DPI
    var k = 54
    while (k < offBits) { out(k) = 0xCC.toByte; k += 1 }
    var storedRow = 0
    while (storedRow < h) {
      val imgRow = h - 1 - storedRow // bottom-up
      val base = offBits + storedRow * stride
      var c = 0
      while (c < width) {
        val idx = imgRow * width + c
        val g = if (idx < gray.length) gray(idx) else PadByte
        out(base + 3 * c) = g      // B
        out(base + 3 * c + 1) = g  // G
        out(base + 3 * c + 2) = g  // R
        c += 1
      }
      storedRow += 1
    }
    out
  }

  /** Strict decode. Every Left is a distinct structural refusal — a
    * real ingest routes these rows to quarantine, never crashes. */
  def parse(bytes: Array[Byte]): Either[String, BmpImage] = {
    if (bytes.length < 54) return Left(s"truncated header: ${bytes.length} < 54 bytes")
    if (bytes(0) != 'B' || bytes(1) != 'M') return Left("bad magic: not 'BM'")
    val fileSize = u32(bytes, 2)
    if (fileSize != bytes.length)
      return Left(s"declared size $fileSize != actual ${bytes.length}")
    val offBits = u32(bytes, 10)
    if (offBits < 54 || offBits > bytes.length)
      return Left(s"pixel offset $offBits outside file")
    val biSize = u32(bytes, 14)
    if (biSize != 40) return Left(s"unsupported DIB header size $biSize (want 40)")
    val w = i32(bytes, 18)
    val h = i32(bytes, 22)
    if (w <= 0 || w > MaxDim) return Left(s"invalid width $w")
    if (h < 0) return Left("top-down (negative height) BMP not supported")
    if (h == 0 || h > MaxDim) return Left(s"invalid height $h")
    if (w.toLong * h > MaxPixels) return Left(s"image too large: ${w.toLong * h} pixels")
    if (u16(bytes, 26) != 1) return Left(s"planes ${u16(bytes, 26)} != 1")
    val bpp = u16(bytes, 28)
    if (bpp != 24) return Left(s"unsupported bit depth $bpp (want 24)")
    val compression = u32(bytes, 30)
    if (compression != 0) return Left(s"compressed BMP (method $compression) not supported")
    val stride = (3 * w + 3) / 4 * 4
    if (offBits + stride.toLong * h > bytes.length)
      return Left(s"pixel array overruns file: need ${offBits + stride.toLong * h}, " +
        s"have ${bytes.length}")
    val gray = new Array[Byte](w * h)
    var storedRow = 0
    while (storedRow < h) {
      val imgRow = h - 1 - storedRow
      val base = (offBits + storedRow.toLong * stride).toInt
      var c = 0
      while (c < w) {
        val b = bytes(base + 3 * c) & 0xFF
        val g = bytes(base + 3 * c + 1) & 0xFF
        val r = bytes(base + 3 * c + 2) & 0xFF
        gray(imgRow * w + c) = ((b + g + r) / 3).toByte
        c += 1
      }
      storedRow += 1
    }
    Right(BmpImage(w, h, gray))
  }
}
