package graft

import graft.functions.AlphaCount
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** graft_alpha_count ≡ length(regexp_replace(text, '[^a-z]', '')) —
  * the byte-pass kernel must match the regex form on every input
  * class, including the ones the byte argument hinges on (multi-byte
  * sequences, supplementary-plane code points, and INVALID UTF-8,
  * where the regex path sanitizes before counting). */
class AlphaCountSpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def regexCount(s: String): Long =
    s.replaceAll("[^a-z]", "").length.toLong

  test("kernel == regex on generated strings (ascii, unicode, emoji)") {
    val gen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)
        .suchThat(c => !Character.isSurrogate(c))).map(_.mkString),
      Gen.listOf(Gen.oneOf("a", "Z", "é", "ß", "😀", " ", "z", "9", "ç"))
        .map(_.mkString))
    forAll(gen) { s =>
      assert(AlphaCount.compute(UTF8String.fromString(s)) === regexCount(s))
    }
    assert(AlphaCount.compute(UTF8String.fromString("")) === 0L)
  }

  test("kernel == decoded-regex count on INVALID UTF-8 bytes") {
    // the sanitizing path: decode (malformed → U+FFFD), then count —
    // exactly what regexp_replace over a string column sees
    val fixtures = Seq[Array[Byte]](
      Array(0xFF.toByte, 'a', 0xFE.toByte, 'z'),          // lone invalid leads
      Array(0xC3.toByte, 'a'),                            // truncated 2-byte seq
      Array(0xC3.toByte, 0xA1.toByte, 'b'),               // valid 'á' then ascii
      Array(0xE2.toByte, 0x82.toByte, 'q'),               // truncated 3-byte seq
      Array('m', 0x80.toByte, 'n'))                       // stray continuation
    fixtures.foreach { bytes =>
      val sanitized = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      assert(AlphaCount.compute(UTF8String.fromBytes(bytes)) ===
        regexCount(sanitized), bytes.mkString(","))
    }
  }

  test("dataframe-level: kernel column == regex column on the corpus") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val mismatches = Tables.documents(spark, sf)
      .select(expr("graft_alpha_count(text)").as("k"),
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("r"))
      .filter(col("k") =!= col("r")).count()
    assert(mismatches === 0L)
  }
}
