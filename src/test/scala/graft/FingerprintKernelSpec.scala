package graft

import graft.queries.TextAnalysis
import org.apache.spark.sql.functions._

/** Kernel-twin contract for `graft_fingerprint`
  * ([[graft.functions.NormFingerprint]]): the single-byte-pass
  * normalize+md5 must be indistinguishable from the composable chain
  * `md5(trim(regexp_replace(regexp_replace(lower(text),
  * '[^a-z0-9 ]', ''), ' +', ' ')))` it replaces — on the corpus and
  * on an adversarial set covering the unicode lowercase edge cases
  * the kernel's scaladoc declares (Kelvin sign → k, İ → i, everything
  * else non-ASCII stripped). */
class FingerprintKernelSpec extends SparkSpec {

  private def kernel(c: org.apache.spark.sql.Column) =
    call_function("graft_fingerprint", c)

  test("kernel == composable twin on the corpus") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    val rows = Tables.documents(spark, sf)
      .select(col("doc_id"),
        kernel(col("text")).as("got"),
        TextAnalysis.fingerprintTwin(col("text")).as("twin"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.get(1) === r.get(2), s"doc ${r.get(0)}: kernel vs twin")
    }
  }

  test("adversarial inputs agree with the twin") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val cases = Seq(
      "", " ", "   ", "!!!", "...---...",
      "Hello World", "hello world", "HELLO WORLD",
      "  leading", "trailing  ", "  both  ",
      "a  b   c    d", "a!b", "a ! b", "a-b_c.d",
      "MiXeD CaSe 123", "42", "0x1F", "A+B=C 42",
      "tab\tand\nnewline\rchars", // non-space whitespace strips, no gap
      "café crème",     // accents strip
      "K elvin",             // KELVIN SIGN lowercases to ASCII k
      "İstanbul",            // İ: full map i+U+0307 vs simple i
      "ıssiz",               // dotless ı strips (not ASCII)
      "straße",              // ß lowercase is ß → strips
      "ＡＢＣ",       // fullwidth ABC → fullwidth abc → strip
      "中文 text",        // CJK strips
      "emoji 😀 here",  // 4-byte sequence strips
      "i̇ combining",        // combining dot above strips
      "Σσς",       // Greek sigmas strip
      "ends with kelvin K",
      "KK double kelvin",
      "0123456789 ABCDEFGHIJKLMNOPQRSTUVWXYZ abcdefghijklmnopqrstuvwxyz")
    val rows = cases.toDF("text")
      .select(col("text"),
        kernel(col("text")).as("got"),
        TextAnalysis.fingerprintTwin(col("text")).as("twin"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) === r.get(2),
        s"on input '${r.getString(0)}': got=${r.get(1)} twin=${r.get(2)}")
    }
    // null flows through as null, matching the twin's chain
    val nr = Seq[(Integer, String)]((1, null)).toDF("id", "text")
      .select(kernel(col("text")), TextAnalysis.fingerprintTwin(col("text")))
      .collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("malformed UTF-8 strips only itself — valid neighbors survive") {
    import graft.functions.NormFingerprint.compute
    import org.apache.spark.unsafe.types.UTF8String.{fromBytes, fromString}
    def bytes(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray
    val ab = compute(fromString("ab"))
    // stray continuation byte between letters
    assert(compute(fromBytes(bytes('a', 0x80, 'b'))) === ab)
    // 3-byte lead with no continuations: consumes only itself
    assert(compute(fromBytes(bytes(0xE0, 'a', 'b'))) === ab)
    // truncated trailing sequence
    assert(compute(fromBytes(bytes('a', 'b', 0xE4))) === ab)
    // overlong lead (0xC0/0xC1) and out-of-range lead (0xF5+)
    assert(compute(fromBytes(bytes(0xC0, 'a', 0xF5, 'b'))) === ab)
    // truncated 4-byte lead with one real continuation: both strip
    assert(compute(fromBytes(bytes('a', 0xF0, 0x9F, 'b'))) === ab)
    // overlong sequences are structurally well-formed (valid lead +
    // continuations) but encode a codepoint below the length's
    // minimum — the twin's decoder replaces them with U+FFFD, so the
    // kernel must strip, NOT decode: E0 81 A1 is an overlong 'a',
    // F0 80 81 A1 an overlong-4 'a', F0 8F BF BF an overlong U+FFFF
    assert(compute(fromBytes(bytes('a', 0xE0, 0x81, 0xA1, 'b'))) === ab)
    assert(compute(fromBytes(bytes('a', 0xF0, 0x80, 0x81, 0xA1, 'b'))) === ab)
    assert(compute(fromBytes(bytes('a', 0xF0, 0x8F, 0xBF, 0xBF, 'b'))) === ab)
    // beyond-plane: F4 90 80 80 = U+110000 — malformed for the twin
    assert(compute(fromBytes(bytes('a', 0xF4, 0x90, 0x80, 0x80, 'b'))) === ab)
    // CESU-8 surrogate half ED A0 80 (U+D800): strips in both
    assert(compute(fromBytes(bytes('a', 0xED, 0xA0, 0x80, 'b'))) === ab)
  }

  test("spot-pinned digests (not just twin-relative)") {
    graft.plans.GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    // md5('') and md5('hello world') are public constants: if BOTH
    // kernel and twin drifted together these would catch it
    val rows = Seq("!!!", "  Hello,  World!  ").toDF("text")
      .select(kernel(col("text"))).collect()
    assert(rows(0).getString(0) === "d41d8cd98f00b204e9800998ecf8427e")
    assert(rows(1).getString(0) === "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }
}
