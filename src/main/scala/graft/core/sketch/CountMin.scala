package graft.core.sketch

/**
 * Count-Min sketch (Cormode & Muthukrishnan 2005) over pre-hashed 64-bit
 * keys. Generalizes the reference's exact per-domain `queries_count`
 * (/root/reference/internal/dataset.go:46) into a bounded-memory frequency
 * sketch for the web-scale pipeline (north_star: "CM frequency").
 *
 * - `update(hash, count)`: add `count` to one counter per row, row hashes
 *   derived from the key by the Kirsch–Mitzenmacher double-hash trick.
 * - `estimate(hash)`: min over rows — an overestimate, within eps*N
 *   (eps = e/width) with probability 1 - delta (delta = e^-depth).
 * - `merge`: element-wise add; associative and commutative (same dims).
 *
 * Wire format: [magic 'C','M', ver 1, depth u8] [width i32 BE] [depth*width
 * counters i64 BE]. Fixed-size once parameterized; default 5 x 2048 = 80 KiB.
 */
final class CountMin private (val depth: Int, val width: Int, val table: Array[Long]) extends Serializable {

  def this(depth: Int = CountMin.DefaultDepth, width: Int = CountMin.DefaultWidth) =
    this(depth, width, new Array[Long](depth * width))

  require(depth >= 1 && depth <= 64, s"depth $depth")
  require(width >= 2 && Integer.bitCount(width) == 1, s"width must be a power of two: $width")

  @inline private def col(hash: Long, row: Int): Int = {
    // double hashing: h1 + row*h2, h2 odd to cycle the full power-of-two ring
    val h2 = (hash >>> 32) * 0x9E3779B97F4A7C15L | 1L
    (((hash + row * h2) >>> 16) & (width - 1)).toInt
  }

  def update(hash: Long, count: Long): Unit = {
    var r = 0
    while (r < depth) { table(r * width + col(hash, r)) += count; r += 1 }
  }

  def estimate(hash: Long): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(r * width + col(hash, r))
      if (v < min) min = v
      r += 1
    }
    min
  }

  /** Total added count (row sums are all equal to N). */
  def totalCount: Long = {
    var s = 0L
    var c = 0
    while (c < width) { s += table(c); c += 1 }
    s
  }

  def merge(other: CountMin): Unit = {
    require(other.depth == depth && other.width == width,
      s"CountMin dims mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < table.length) { table(i) += other.table(i); i += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * table.length)
    bb.put('C'.toByte).put('M'.toByte).put(1.toByte).put(depth.toByte).putInt(width)
    var i = 0
    while (i < table.length) { bb.putLong(table(i)); i += 1 }
    bb.array()
  }
}

object CountMin {
  final val DefaultDepth = 5
  final val DefaultWidth = 2048

  def apply(): CountMin = new CountMin(DefaultDepth, DefaultWidth)

  def fromBytes(bytes: Array[Byte]): CountMin = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.remaining >= 8, "CountMin bytes too short")
    require(bb.get() == 'C' && bb.get() == 'M', "bad CountMin magic")
    val ver = bb.get()
    require(ver == 1, s"unsupported CountMin version $ver")
    val depth = bb.get() & 0xff
    val width = bb.getInt
    // validate the untrusted header BEFORE allocating (see BloomFilter)
    require(depth >= 1 && depth <= 64, s"CountMin depth out of range: $depth")
    require(width >= 1 && width.toLong * depth <= (1L << 28),
      s"CountMin table too large: depth=$depth width=$width")
    require(bb.remaining == 8L * depth * width,
      s"CountMin payload size mismatch: ${bb.remaining} bytes")
    val table = new Array[Long](depth * width)
    var i = 0
    while (i < table.length) { table(i) = bb.getLong; i += 1 }
    new CountMin(depth, width, table)
  }

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ca = fromBytes(a); ca.merge(fromBytes(b)); ca.toBytes
  }
}
