package graft

import graft.sources.BmpCodec
import org.scalatest.funsuite.AnyFunSuite

/** Strict-decoder gate for the BMP codec (the mm family's image
  * container, SURVEY §2 #38c/e/g): round-trip fidelity on every
  * width/stride-pad class, and one distinct refusal per structural
  * damage class — the quarantine-not-crash contract. */
class BmpSpec extends AnyFunSuite {

  private def plane(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 37 + 11) % 251).toByte)

  test("round trip: decoded plane is the letterboxed payload, every stride-pad class") {
    // widths 36..48 cover 3w mod 4 = 0,1,2,3 (stride pad 0,3,2,1)
    for (w <- Seq(36, 39, 42, 45, 48); n <- Seq(0, 1, w - 1, w, w + 1, 5 * w + 7);
         gap <- Seq(false, true)) {
      val src = plane(n)
      val img = BmpCodec.parse(BmpCodec.encode(src, w, withGap = gap))
        .fold(e => fail(s"w=$w n=$n gap=$gap: $e"), identity)
      val h = math.max((n + w - 1) / w, 1)
      assert(img.width === w && img.height === h, s"w=$w n=$n")
      assert(img.gray.length === w * h)
      assert(img.gray.take(n).toSeq === src.toSeq, s"w=$w n=$n gap=$gap")
      assert(img.gray.drop(n).forall(_ == BmpCodec.PadByte), s"letterbox w=$w n=$n")
    }
  }

  test("gray recovery is the integer channel mean (general 24-bit BMPs, not just ours)") {
    // hand-build a 1×1 BMP with unequal channels: B=10, G=20, R=33
    val bmp = BmpCodec.encode(Array[Byte](0), 1)
    bmp(54) = 10; bmp(55) = 20; bmp(56) = 33
    val img = BmpCodec.parse(bmp).toOption.get
    assert((img.gray(0) & 0xff) === (10 + 20 + 33) / 3)
  }

  test("rows are un-flipped from bottom-up storage") {
    // 2×2 plane [0,1 / 2,3]: stored bottom row first on disk
    val img = BmpCodec.parse(BmpCodec.encode(Array[Byte](0, 1, 2, 3), 2)).toOption.get
    assert(img.gray.toSeq === Seq[Byte](0, 1, 2, 3))
    val raw = BmpCodec.encode(Array[Byte](0, 1, 2, 3), 2)
    // first stored pixel (offset 54) is image row 1 col 0 = value 2
    assert(raw(54) === 2.toByte)
  }

  test("refusals: one Left per structural damage class") {
    val good = BmpCodec.encode(plane(100), 36)
    def mutate(f: Array[Byte] => Unit): Either[String, _] = {
      val b = good.clone(); f(b); BmpCodec.parse(b)
    }
    assert(BmpCodec.parse(good.take(40)).swap.exists(_.contains("truncated")))
    assert(mutate(_(0) = 'X').swap.exists(_.contains("magic")))
    // declared size vs actual: append trailing junk without fixing bfSize
    assert(BmpCodec.parse(good ++ Array[Byte](0)).swap.exists(_.contains("declared size")))
    assert(mutate(_(14) = 124.toByte).swap.exists(_.contains("DIB header")))   // biSize 124
    assert(mutate(_(28) = 8).swap.exists(_.contains("bit depth")))             // 8bpp
    assert(mutate(_(30) = 1).swap.exists(_.contains("compressed")))            // BI_RLE8
    assert(mutate(_(26) = 2).swap.exists(_.contains("planes")))
    // negative height = top-down: refused, not silently mis-flipped
    assert(mutate { b => b(22) = 0xFD.toByte; b(23) = 0xFF.toByte
      b(24) = 0xFF.toByte; b(25) = 0xFF.toByte
    }.swap.exists(_.contains("top-down")))
    // width inflated so the pixel array overruns the actual bytes
    assert(mutate { b => b(18) = 0xFF.toByte; b(19) = 0x1F.toByte }
      .swap.exists(e => e.contains("overruns") || e.contains("too large")))
    // pixel offset pointing past the end of the file
    assert(mutate { b => b(10) = 0xFF.toByte; b(11) = 0xFF.toByte }
      .swap.exists(_.contains("outside file")))
    // hostile gigapixel header inside a small file
    assert(mutate { b =>
      b(18) = 0.toByte; b(19) = 0x70.toByte // width 0x7000 = 28672 (< MaxDim)
      b(22) = 0.toByte; b(23) = 0x70.toByte // height 28672 → w·h > MaxPixels
    }.swap.exists(_.contains("too large")))
    // the unmutated container still parses (mutations were the cause)
    assert(BmpCodec.parse(good).isRight)
  }

  test("planted near-dup: one changed sampled pixel moves ≤2 dHash bits in ONE band") {
    import graft.queries.Multimodal
    val base = plane(400) // w = 36, h = 12: all 8 grid rows distinct
    assert(Multimodal.imageWidth(400) === 36)
    // grid row r=2 samples image row 2*12/8 = 3; grid col c=2 samples
    // pixel col 2*36/9 = 8 → position 3*36+8 = 116, part of the
    // (c=1,c=2) and (c=2,c=3) compares of bits 17,18 (band 1)
    val near = base.clone(); near(116) = 250.toByte
    val hb = Multimodal.phashOfPayload(base)
    val hn = Multimodal.phashOfPayload(near)
    val diffs = (0 to 3).map(i => Integer.bitCount(hb(i) ^ hn(i)))
    assert(diffs.sum >= 1 && diffs.sum <= 2, diffs.toString)
    assert(diffs.zipWithIndex.count { case (d, _) => d > 0 } === 1, diffs.toString)
    assert(diffs(1) === diffs.sum, diffs.toString) // confined to band 1
    // an UNSAMPLED pixel change is invisible to the hash (col 9 is
    // between grid cols 8 and 12)
    val invis = base.clone(); invis(3 * 36 + 9) = 250.toByte
    assert(Multimodal.phashOfPayload(invis).toSeq === hb.toSeq)
  }
}
