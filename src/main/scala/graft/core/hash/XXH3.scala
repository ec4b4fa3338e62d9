package graft.core.hash

/**
 * From-scratch XXH3 (64-bit, seed=0, default secret) — the hash the reference
 * pipeline applies to normalized client bytes (reference: go.mod `zeebo/xxh3`,
 * applied at /root/reference/internal/ip_address.go:44-45).
 *
 * Spark's built-in `xxhash64` is XXH64 — a *different* algorithm — so a
 * from-scratch XXH3 is required to reproduce the reference's hash vectors
 * (e.g. `192.0.2.1` /24-truncated -> 0xb15ce949ae6f3312, pinned at
 * /root/reference/internal/interop_test.go:100-117).
 *
 * Implemented from the public xxHash specification
 * (github.com/Cyan4973/xxHash, XXH3 one-shot 64-bit variant). The 192-byte
 * default secret `kSecret` is the published constant from the spec. All
 * length classes (0, 1-3, 4-8, 9-16, 17-128, 129-240, >240) are covered;
 * validated against independent third-party XXH3 output for lengths 0..4096.
 *
 * Pure JVM, allocation-free in the hot path; safe to call from Catalyst
 * expression eval on executor threads (stateless object).
 */
object XXH3 {

  // Published xxHash prime constants.
  private final val P32_1 = 0x9E3779B1L
  private final val P32_2 = 0x85EBCA77L
  private final val P32_3 = 0xC2B2AE3DL
  private final val P64_1 = 0x9E3779B185EBCA87L
  private final val P64_2 = 0xC2B2AE3D27D4EB4FL
  private final val P64_3 = 0x165667B19E3779F9L
  private final val P64_4 = 0x85EBCA77C2B2AE63L
  private final val P64_5 = 0x27D4EB2F165667C5L
  private final val PRIME_MX1 = 0x165667919E3779F9L
  private final val PRIME_MX2 = 0x9FB21C651E98DF25L

  /** Published 192-byte XXH3 default secret (kSecret). */
  private val kSecret: Array[Byte] = hexToBytes(
    "b8fe6c3923a44bbe7c01812cf721ad1cded46de9839097db7240a4a4b7b3671f" +
    "cb79e64eccc0e578825ad07dccff7221b8084674f743248ee03590e6813a264c" +
    "3c2852bb91c300cb88d0658b1b532ea371644897a20df94e3819ef46a9deacd8" +
    "a8fa763fe39c343ff9dcbbc7c70b4f1d8a51e04bcdb45931c89f7ec9d9787364" +
    "eac5ac8334d3ebc3c581a0fffa1363eb170ddd51b7f0da49d316552629d4689e" +
    "2b16be587d47a1fc8ff8b8d17ad031ce45cb3a8f95160428afd7fbcabb4b407e")

  def hexToBytes(hex: String): Array[Byte] = {
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  // Zero-copy memory access via Spark's Platform (sun.misc.Unsafe): lets
  // the same code path hash byte[] contents and UTF8String payloads without
  // copying. Reads are fixed up to little-endian on big-endian hosts.
  private val BigEndian =
    java.nio.ByteOrder.nativeOrder() == java.nio.ByteOrder.BIG_ENDIAN
  private final val BYTE_ARRAY_OFFSET =
    org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET.toLong

  @inline private def readLE64(base: AnyRef, off: Long): Long = {
    val v = org.apache.spark.unsafe.Platform.getLong(base, off)
    if (BigEndian) java.lang.Long.reverseBytes(v) else v
  }

  @inline private def readLE32(base: AnyRef, off: Long): Long = {
    val v = org.apache.spark.unsafe.Platform.getInt(base, off)
    (if (BigEndian) Integer.reverseBytes(v) else v) & 0xffffffffL
  }

  @inline private def readByte(base: AnyRef, off: Long): Long =
    org.apache.spark.unsafe.Platform.getByte(base, off) & 0xffL

  @inline private def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37
    h *= PRIME_MX1
    h ^ (h >>> 32)
  }

  @inline private def avalanche64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= P64_2
    h ^= h >>> 29
    h *= P64_3
    h ^ (h >>> 32)
  }

  @inline private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= java.lang.Long.rotateLeft(h, 49) ^ java.lang.Long.rotateLeft(h, 24)
    h *= PRIME_MX2
    h ^= (h >>> 35) + len
    h *= PRIME_MX2
    h ^ (h >>> 28)
  }

  /** One-shot XXH3-64 with seed 0 over the whole array. */
  def hash(input: Array[Byte]): Long =
    hashMem(input, BYTE_ARRAY_OFFSET, input.length)

  /** One-shot XXH3-64 with seed 0 over input[off, off+len). */
  def hash(input: Array[Byte], off: Int, len: Int): Long =
    hashMem(input, BYTE_ARRAY_OFFSET + off, len)

  /** Zero-copy hash of a UTF8String payload (no byte[] materialization —
    * this is the per-row hot path of the sketch-build pipeline). */
  def hashUTF8(s: org.apache.spark.unsafe.types.UTF8String): Long =
    hashMem(s.getBaseObject, s.getBaseOffset, s.numBytes)

  /** One-shot XXH3-64 over arbitrary memory (base + absolute offset). */
  def hashMem(in: AnyRef, off: Long, len: Int): Long = {
    if (len <= 16) {
      if (len > 8) len9to16(in, off, len)
      else if (len >= 4) len4to8(in, off, len)
      else if (len > 0) len1to3(in, off, len)
      else avalanche64(readLE64(kSecret, BYTE_ARRAY_OFFSET + (56)) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (64)))
    } else if (len <= 128) len17to128(in, off, len)
    else if (len <= 240) len129to240(in, off, len)
    else hashLong(in, off, len)
  }

  private def len1to3(in: AnyRef, off: Long, len: Int): Long = {
    val c1 = readByte(in, off)
    val c2 = readByte(in, off + (len >> 1))
    val c3 = readByte(in, off + len - 1)
    val combined = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
    val bitflip = readLE32(kSecret, BYTE_ARRAY_OFFSET + (0)) ^ readLE32(kSecret, BYTE_ARRAY_OFFSET + (4))
    avalanche64(combined ^ bitflip)
  }

  private def len4to8(in: AnyRef, off: Long, len: Int): Long = {
    val in1 = readLE32(in, off)
    val in2 = readLE32(in, off + len - 4)
    val bitflip = readLE64(kSecret, BYTE_ARRAY_OFFSET + (8)) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (16))
    val input64 = in2 | (in1 << 32)
    rrmxmx(input64 ^ bitflip, len.toLong)
  }

  private def len9to16(in: AnyRef, off: Long, len: Int): Long = {
    val bitflip1 = readLE64(kSecret, BYTE_ARRAY_OFFSET + (24)) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (32))
    val bitflip2 = readLE64(kSecret, BYTE_ARRAY_OFFSET + (40)) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (48))
    val inLo = readLE64(in, off) ^ bitflip1
    val inHi = readLE64(in, off + len - 8) ^ bitflip2
    val acc = len.toLong +
      java.lang.Long.reverseBytes(inLo) + inHi +
      mulFold(inLo, inHi)
    avalanche(acc)
  }

  /** unsigned 128-bit product of a*b, folded lo^hi. */
  @inline private def mulFold(a: Long, b: Long): Long = {
    val lo = a * b
    var hi = Math.multiplyHigh(a, b)
    if (a < 0) hi += b
    if (b < 0) hi += a
    lo ^ hi
  }

  @inline private def mix16B(in: AnyRef, inOff: Long, secOff: Int): Long =
    mulFold(readLE64(in, inOff) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (secOff)),
            readLE64(in, inOff + 8) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (secOff + 8)))

  private def len17to128(in: AnyRef, off: Long, len: Int): Long = {
    var acc = len.toLong * P64_1
    if (len > 32) {
      if (len > 64) {
        if (len > 96) {
          acc += mix16B(in, off + 48, 96)
          acc += mix16B(in, off + len - 64, 112)
        }
        acc += mix16B(in, off + 32, 64)
        acc += mix16B(in, off + len - 48, 80)
      }
      acc += mix16B(in, off + 16, 32)
      acc += mix16B(in, off + len - 32, 48)
    }
    acc += mix16B(in, off, 0)
    acc += mix16B(in, off + len - 16, 16)
    avalanche(acc)
  }

  private def len129to240(in: AnyRef, off: Long, len: Int): Long = {
    var acc = len.toLong * P64_1
    val nbRounds = len / 16
    var i = 0
    while (i < 8) { acc += mix16B(in, off + 16 * i, 16 * i); i += 1 }
    acc = avalanche(acc)
    while (i < nbRounds) { acc += mix16B(in, off + 16 * i, 16 * (i - 8) + 3); i += 1 }
    acc += mix16B(in, off + len - 16, 136 - 17)
    avalanche(acc)
  }

  private final val StripeLen = 64
  private final val SecretConsumeRate = 8
  private final val NbStripesPerBlock = (192 - StripeLen) / SecretConsumeRate // 16
  private final val BlockLen = StripeLen * NbStripesPerBlock                  // 1024

  private def hashLong(in: AnyRef, off: Long, len: Int): Long = {
    val acc = new Array[Long](8)
    acc(0) = P32_3; acc(1) = P64_1; acc(2) = P64_2; acc(3) = P64_3
    acc(4) = P64_4; acc(5) = P32_2; acc(6) = P64_5; acc(7) = P32_1

    val nbBlocks = (len - 1) / BlockLen
    var b = 0
    while (b < nbBlocks) {
      var s = 0
      while (s < NbStripesPerBlock) {
        accumulate512(acc, in, off + b * BlockLen + s * StripeLen, s * SecretConsumeRate)
        s += 1
      }
      scramble(acc)
      b += 1
    }
    val nbStripes = ((len - 1) - BlockLen * nbBlocks) / StripeLen
    var s = 0
    while (s < nbStripes) {
      accumulate512(acc, in, off + nbBlocks * BlockLen + s * StripeLen, s * SecretConsumeRate)
      s += 1
    }
    // last stripe
    accumulate512(acc, in, off + len - StripeLen, 192 - StripeLen - 7)
    // merge
    var result = len.toLong * P64_1
    var i = 0
    while (i < 4) {
      result += mulFold(acc(2 * i) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (11 + 16 * i)),
                        acc(2 * i + 1) ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (11 + 16 * i + 8)))
      i += 1
    }
    avalanche(result)
  }

  @inline private def accumulate512(acc: Array[Long], in: AnyRef, inOff: Long, secOff: Int): Unit = {
    var i = 0
    while (i < 8) {
      val dataVal = readLE64(in, inOff + 8 * i)
      val dataKey = dataVal ^ readLE64(kSecret, BYTE_ARRAY_OFFSET + (secOff + 8 * i))
      acc(i ^ 1) += dataVal
      acc(i) += (dataKey & 0xffffffffL) * (dataKey >>> 32)
      i += 1
    }
  }

  @inline private def scramble(acc: Array[Long]): Unit = {
    var i = 0
    while (i < 8) {
      var a = acc(i)
      a ^= a >>> 47
      a ^= readLE64(kSecret, BYTE_ARRAY_OFFSET + (192 - StripeLen + 8 * i))
      acc(i) = a * P32_1
      i += 1
    }
  }

  /** XXH3 over a UTF-8 encoded string (convenience for hashing hostnames). */
  def hashString(s: String): Long = hash(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
