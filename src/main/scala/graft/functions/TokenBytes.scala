package graft.functions

/** Shared byte-level tokenization for the native text-moment
  * expressions ([[SimhashText]], [[MinhashSigs]], [[BigramStats]]).
  *
  * `split(text, " ")` separates on SINGLE spaces (0x20 — a byte that
  * never occurs inside a UTF-8 multi-byte sequence), so token
  * boundaries come from one byte scan, and any k consecutive tokens
  * joined with single spaces equal a byte range of the original
  * string. That identity is what lets the shingle/bigram hashes run
  * over slices of the input without ever building a string.
  */
private[functions] object TokenBytes {

  /** Start offset of each token; length == token count (≥ 1). */
  def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    val nB = bytes.length
    var m = 1
    var i = 0
    while (i < nB) { if (bytes(i) == 0x20) m += 1; i += 1 }
    val starts = new Array[Int](m)
    var t = 1
    i = 0
    while (i < nB) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts
  }

  val md5: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** 60-bit hash of `bytes[from, to)` — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)`: md5's first 15 hex
    * chars are bytes 0..6 (56 bits) then byte 7's high nibble. */
  def hash60(dig: java.security.MessageDigest,
             bytes: Array[Byte], from: Int, to: Int): Long = {
    dig.reset()
    dig.update(bytes, from, to - from)
    val d = dig.digest()
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }
}
