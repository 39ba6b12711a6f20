package graft.stablehash

/** xxh3 128-bit hash with seed — the hash primitive under graph-node's
  * proof-of-indexing FastHasher (reference stablehash/fast_hasher.go:
  * `xxhash_rust::xxh3::xxh3_128_with_seed`).
  *
  * Self-contained scalar implementation of the public XXH3 algorithm
  * (Yann Collet's xxHash, BSD-2) — the sandbox jars ship only the old
  * XXH64, and the POI digests must match graph-node bit-for-bit, so the
  * 128-bit variant is implemented here from the specification. All
  * arithmetic is wrapping two's-complement, which Java longs give
  * natively; unsigned comparisons/multiplies use the explicit helpers.
  *
  * Verified two ways (StableHashSpec): end-to-end by the reference's
  * FastHasher/POI test vectors (0, 1-3, 4-8, 9-16, 17-128 byte paths
  * with varied seeds), and directly against the official xxHash
  * sanity vectors (cli/xsum_sanity_check.c's XXH128 table over its
  * PRNG-filled buffer) at lengths 0..2367 with seeds 0/PRIME32/PRIME64
  * — the latter pins the 129-240 midsize path (len 222) and the >240
  * block path (403 partial-block, 512, 2048 two-block boundary, 2240
  * block+full-stripe boundary, 2367), so long entity values hash
  * bit-identically to graph-node too.
  */
object XxHash3 {

  final case class Hash128(lo: Long, hi: Long)

  private final val P32_1 = 0x9E3779B1L
  private final val P32_2 = 0x85EBCA77L
  private final val P32_3 = 0xC2B2AE3DL
  private final val P64_1 = 0x9E3779B185EBCA87L
  private final val P64_2 = 0xC2B2AE3D27D4EB4FL
  private final val P64_3 = 0x165667B19E3779F9L
  private final val P64_4 = 0x85EBCA77C2B2AE63L
  private final val P64_5 = 0x27D4EB2F165667C5L
  private final val MX1 = 0x165667919E3779F9L
  private final val MX2 = 0x9FB21C651E98DF25L

  /** The 192-byte default secret from the xxHash reference. */
  private val kSecret: Array[Byte] = Array(
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c, 0xf7, 0x21, 0xad, 0x1c,
    0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb, 0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f,
    0xcb, 0x79, 0xe6, 0x4e, 0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6, 0x81, 0x3a, 0x26, 0x4c,
    0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb, 0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3,
    0x71, 0x64, 0x48, 0x97, 0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7, 0xc7, 0x0b, 0x4f, 0x1d,
    0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31, 0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64,
    0xea, 0xc5, 0xac, 0x83, 0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26, 0x29, 0xd4, 0x68, 0x9e,
    0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc, 0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce,
    0x45, 0xcb, 0x3a, 0x8f, 0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e
  ).map(_.toByte)

  // ---- primitive helpers ----------------------------------------------

  private def readLE64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }

  private def readLE32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def writeLE64(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
  }

  private def swap32(x: Long): Long = {
    val v = x & 0xFFFFFFFFL
    ((v << 24) | ((v & 0xFF00) << 8) | ((v >>> 8) & 0xFF00) | (v >>> 24)) & 0xFFFFFFFFL
  }

  private def rotl32(x: Long, r: Int): Long = {
    val v = x & 0xFFFFFFFFL
    ((v << r) | (v >>> (32 - r))) & 0xFFFFFFFFL
  }

  private def swap64(x: Long): Long = java.lang.Long.reverseBytes(x)

  /** high 64 bits of the UNSIGNED 128-bit product. */
  private def unsignedMulHigh(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + (if (a < 0) b else 0L) + (if (b < 0) a else 0L)

  private def mul128Fold64(a: Long, b: Long): Long =
    (a * b) ^ unsignedMulHigh(a, b)

  private def mult32to64(a: Long, b: Long): Long =
    (a & 0xFFFFFFFFL) * (b & 0xFFFFFFFFL)

  private def xorshift64(v: Long, s: Int): Long = v ^ (v >>> s)

  private def xxh64Avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P64_2; h ^= h >>> 29; h *= P64_3; h ^= h >>> 32
    h
  }

  private def xxh3Avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37; h *= MX1; h ^= h >>> 32
    h
  }

  // ---- 0..16 ------------------------------------------------------------

  private def len1to3(in: Array[Byte], seed: Long): Hash128 = {
    val len = in.length
    val c1 = in(0) & 0xFFL
    val c2 = in(len >> 1) & 0xFFL
    val c3 = in(len - 1) & 0xFFL
    val combinedl = ((c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)) & 0xFFFFFFFFL
    val combinedh = rotl32(swap32(combinedl), 13)
    val bitflipl = ((readLE32(kSecret, 0) ^ readLE32(kSecret, 4)) & 0xFFFFFFFFL) + seed
    val bitfliph = ((readLE32(kSecret, 8) ^ readLE32(kSecret, 12)) & 0xFFFFFFFFL) - seed
    Hash128(xxh64Avalanche(combinedl ^ bitflipl), xxh64Avalanche(combinedh ^ bitfliph))
  }

  private def len4to8(in: Array[Byte], seed0: Long): Hash128 = {
    val len = in.length
    val seed = seed0 ^ (swap32(seed0 & 0xFFFFFFFFL) << 32)
    val inputLo = readLE32(in, 0)
    val inputHi = readLE32(in, len - 4)
    val input64 = inputLo + (inputHi << 32)
    val bitflip = (readLE64(kSecret, 16) ^ readLE64(kSecret, 24)) + seed
    val keyed = input64 ^ bitflip
    var lo = keyed * (P64_1 + (len.toLong << 2))
    var hi = unsignedMulHigh(keyed, P64_1 + (len.toLong << 2))
    hi += lo << 1
    lo ^= hi >>> 3
    lo = xorshift64(lo, 35)
    lo *= MX2
    lo = xorshift64(lo, 28)
    Hash128(lo, xxh3Avalanche(hi))
  }

  private def len9to16(in: Array[Byte], seed: Long): Hash128 = {
    val len = in.length
    val bitflipl = (readLE64(kSecret, 32) ^ readLE64(kSecret, 40)) - seed
    val bitfliph = (readLE64(kSecret, 48) ^ readLE64(kSecret, 56)) + seed
    val inputLo = readLE64(in, 0)
    var inputHi = readLE64(in, len - 8)
    val m = inputLo ^ inputHi ^ bitflipl
    var mLo = m * P64_1
    var mHi = unsignedMulHigh(m, P64_1)
    mLo += (len - 1).toLong << 54
    inputHi ^= bitfliph
    mHi += inputHi + mult32to64(inputHi & 0xFFFFFFFFL, P32_2 - 1)
    mLo ^= swap64(mHi)
    val hLo = mLo * P64_2
    var hHi = unsignedMulHigh(mLo, P64_2)
    hHi += mHi * P64_2
    Hash128(xxh3Avalanche(hLo), xxh3Avalanche(hHi))
  }

  private def len0(seed: Long): Hash128 = Hash128(
    xxh64Avalanche(seed ^ readLE64(kSecret, 64) ^ readLE64(kSecret, 72)),
    xxh64Avalanche(seed ^ readLE64(kSecret, 80) ^ readLE64(kSecret, 88)))

  // ---- 17..240 -----------------------------------------------------------

  private def mix16B(in: Array[Byte], inOff: Int, secret: Array[Byte], sOff: Int, seed: Long): Long =
    mul128Fold64(
      readLE64(in, inOff) ^ (readLE64(secret, sOff) + seed),
      readLE64(in, inOff + 8) ^ (readLE64(secret, sOff + 8) - seed))

  private def mix32B(accLo: Long, accHi: Long, in: Array[Byte], off1: Int, off2: Int,
                     secret: Array[Byte], sOff: Int, seed: Long): (Long, Long) = {
    var lo = accLo + mix16B(in, off1, secret, sOff, seed)
    lo ^= readLE64(in, off2) + readLE64(in, off2 + 8)
    var hi = accHi + mix16B(in, off2, secret, sOff + 16, seed)
    hi ^= readLE64(in, off1) + readLE64(in, off1 + 8)
    (lo, hi)
  }

  private def finalize17plus(accLo: Long, accHi: Long, len: Int, seed: Long): Hash128 = {
    val lo = xxh3Avalanche(accLo + accHi)
    val hi = 0L - xxh3Avalanche(
      accLo * P64_1 + accHi * P64_4 + (len.toLong - seed) * P64_2)
    Hash128(lo, hi)
  }

  private def len17to128(in: Array[Byte], seed: Long): Hash128 = {
    val len = in.length
    var accLo = len.toLong * P64_1
    var accHi = 0L
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          val r = mix32B(accLo, accHi, in, 48, len - 64, kSecret, 96, seed)
          accLo = r._1; accHi = r._2
        }
        val r = mix32B(accLo, accHi, in, 32, len - 48, kSecret, 64, seed)
        accLo = r._1; accHi = r._2
      }
      val r = mix32B(accLo, accHi, in, 16, len - 32, kSecret, 32, seed)
      accLo = r._1; accHi = r._2
    }
    val r = mix32B(accLo, accHi, in, 0, len - 16, kSecret, 0, seed)
    finalize17plus(r._1, r._2, len, seed)
  }

  private def len129to240(in: Array[Byte], seed: Long): Hash128 = {
    val len = in.length
    var accLo = len.toLong * P64_1
    var accHi = 0L
    var i = 32
    while (i < 160) {
      val r = mix32B(accLo, accHi, in, i - 32, i - 16, kSecret, i - 32, seed)
      accLo = r._1; accHi = r._2
      i += 32
    }
    accLo = xxh3Avalanche(accLo)
    accHi = xxh3Avalanche(accHi)
    i = 160
    while (i <= len) {
      // MIDSIZE_STARTOFFSET = 3
      val r = mix32B(accLo, accHi, in, i - 32, i - 16, kSecret, 3 + i - 160, seed)
      accLo = r._1; accHi = r._2
      i += 32
    }
    // last 32 bytes, reversed halves, SECRET_SIZE_MIN(136) - LASTOFFSET(17) - 16 = 103
    val r = mix32B(accLo, accHi, in, len - 16, len - 32, kSecret, 103, 0L - seed)
    finalize17plus(r._1, r._2, len, seed)
  }

  // ---- long (>240) --------------------------------------------------------

  private def customSecret(seed: Long): Array[Byte] =
    if (seed == 0L) kSecret
    else {
      val out = new Array[Byte](192)
      var i = 0
      while (i < 12) {
        writeLE64(out, 16 * i, readLE64(kSecret, 16 * i) + seed)
        writeLE64(out, 16 * i + 8, readLE64(kSecret, 16 * i + 8) - seed)
        i += 1
      }
      out
    }

  private def accumulate512(acc: Array[Long], in: Array[Byte], inOff: Int,
                            secret: Array[Byte], sOff: Int): Unit = {
    var i = 0
    while (i < 8) {
      val dataVal = readLE64(in, inOff + 8 * i)
      val dataKey = dataVal ^ readLE64(secret, sOff + 8 * i)
      acc(i ^ 1) += dataVal
      acc(i) += mult32to64(dataKey & 0xFFFFFFFFL, dataKey >>> 32)
      i += 1
    }
  }

  private def scrambleAcc(acc: Array[Long], secret: Array[Byte], sOff: Int): Unit = {
    var i = 0
    while (i < 8) {
      var a = xorshift64(acc(i), 47)
      a ^= readLE64(secret, sOff + 8 * i)
      a *= P32_1
      acc(i) = a
      i += 1
    }
  }

  private def mergeAccs(acc: Array[Long], secret: Array[Byte], sOff: Int, start: Long): Long = {
    var result = start
    var i = 0
    while (i < 4) {
      result += mul128Fold64(
        acc(2 * i) ^ readLE64(secret, sOff + 16 * i),
        acc(2 * i + 1) ^ readLE64(secret, sOff + 16 * i + 8))
      i += 1
    }
    xxh3Avalanche(result)
  }

  private def hashLong(in: Array[Byte], seed: Long): Hash128 = {
    val secret = customSecret(seed)
    val len = in.length
    val acc = Array(P32_3, P64_1, P64_2, P64_3, P64_4, P32_2, P64_5, P32_1)
    val nbStripesPerBlock = (192 - 64) / 8 // 16
    val blockLen = 64 * nbStripesPerBlock  // 1024
    val nbBlocks = (len - 1) / blockLen
    var n = 0
    while (n < nbBlocks) {
      var s = 0
      while (s < nbStripesPerBlock) {
        accumulate512(acc, in, n * blockLen + s * 64, secret, s * 8)
        s += 1
      }
      scrambleAcc(acc, secret, 192 - 64)
      n += 1
    }
    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    var s = 0
    while (s < nbStripes) {
      accumulate512(acc, in, nbBlocks * blockLen + s * 64, secret, s * 8)
      s += 1
    }
    // last stripe: SECRET_LASTACC_START = 7
    accumulate512(acc, in, len - 64, secret, 192 - 64 - 7)
    // SECRET_MERGEACCS_START = 11
    Hash128(
      mergeAccs(acc, secret, 11, len.toLong * P64_1),
      mergeAccs(acc, secret, 192 - 64 - 11, ~(len.toLong * P64_2)))
  }

  /** xxh3_128_with_seed over the full byte array. */
  def hash128(in: Array[Byte], seed: Long): Hash128 = {
    val len = in.length
    if (len <= 16) {
      if (len > 8) len9to16(in, seed)
      else if (len >= 4) len4to8(in, seed)
      else if (len > 0) len1to3(in, seed)
      else len0(seed)
    } else if (len <= 128) len17to128(in, seed)
    else if (len <= 240) len129to240(in, seed)
    else hashLong(in, seed)
  }
}
