package graft.core.sketch

/**
 * KLL quantile sketch over doubles (Karnin, Lang & Liberty, "Optimal
 * quantile approximation in streams", FOCS 2016). north_star: "KLL quantiles
 * of text length".
 *
 * Structure: a stack of compactors; items at level L carry weight 2^L.
 * Level capacities shrink geometrically (ratio 2/3) from k at the top.
 * When total size exceeds the combined capacity, the lowest over-capacity
 * level is sorted and every other item (alternating offset) is promoted to
 * the next level. Normalized rank error is ~1.65/k with high probability
 * (k=200 -> ~0.8%).
 *
 * Merge: concatenate levels pairwise, then compact down to capacity —
 * associative in the sketch-validity sense (any merge tree yields a sketch
 * within the same error bound); tests assert the rank bound, not bytes.
 *
 * Determinism: the compaction offset alternates from a counter (the
 * randomized choice in the paper only matters adversarially), so equal
 * inputs in equal order produce identical sketches — which keeps Spark task
 * retries consistent.
 *
 * Wire format: [magic 'K','L', ver 1, pad] [k i32] [numLevels i32]
 * [offsetParity u8, pad 3] [n i64] [min f64] [max f64] then per level:
 * [count i32] + count f64 items (sorted).
 */
final class Kll private (
    val k: Int,
    private var levels: Array[Array[Double]],   // levels(i) = items at weight 2^i (sorted except level 0)
    private var sizes: Array[Int],
    private var n: Long,
    private var lo: Double,
    private var hi: Double,
    private var parity: Int) {

  def this(k: Int = Kll.DefaultK) =
    this(k, Array(new Array[Double](math.max(k, 8))),
      Array(0), 0L, Double.PositiveInfinity, Double.NegativeInfinity, 0)

  require(k >= 8 && k <= 65535, s"k $k")

  def count: Long = n
  def min: Double = lo
  def max: Double = hi
  def numLevels: Int = levels.length

  def update(x: Double): Unit = {
    if (x.isNaN) return
    if (x < lo) lo = x
    if (x > hi) hi = x
    if (sizes(0) == levels(0).length) compress(force = true)
    levels(0)(sizes(0)) = x
    sizes(0) += 1
    n += 1
  }

  private def totalCapacity(numLv: Int): Int = {
    var c = 0
    var i = 0
    while (i < numLv) { c += Kll.levelCap(k, i, numLv); i += 1 }
    c
  }

  private def totalSize: Int = {
    var s = 0; var i = 0
    while (i < sizes.length) { s += sizes(i); i += 1 }
    s
  }

  private def growLevels(): Unit = {
    val nl = levels.length + 1
    val newLevels = java.util.Arrays.copyOf(levels, nl)
    val newSizes = java.util.Arrays.copyOf(sizes, nl)
    newLevels(nl - 1) = new Array[Double](math.max(Kll.levelCap(k, nl - 1, nl), 8))
    levels = newLevels
    sizes = newSizes
  }

  /** Compact the lowest over-capacity level, promoting half its items.
    * `force` runs at least one round even when the total is under the
    * combined capacity (used when level 0's array is full). */
  private def compress(force: Boolean = false): Unit = {
    var first = force
    var guard = 0
    while ((first || totalSize >= totalCapacity(levels.length)) && guard < 64) {
      first = false
      guard += 1
      // find lowest level exceeding its capacity (or level 0 if none)
      var lv = -1
      var i = 0
      while (i < levels.length && lv < 0) {
        if (sizes(i) >= Kll.levelCap(k, i, levels.length)) lv = i
        i += 1
      }
      if (lv < 0) lv = 0
      if (lv == levels.length - 1) growLevels()
      val items = levels(lv)
      val m = sizes(lv)
      if (m < 2) return
      java.util.Arrays.sort(items, 0, m)
      // promote every other item starting at alternating parity
      val keepOdd = (parity & 1) == 1
      parity += 1
      val promoted = m / 2
      val dst = levels(lv + 1)
      var need = sizes(lv + 1) + promoted
      if (need > dst.length) {
        levels(lv + 1) = java.util.Arrays.copyOf(dst, math.max(need, dst.length * 2))
      }
      var srcIdx = if (keepOdd) 1 else 0
      var d = sizes(lv + 1)
      var p = 0
      while (p < promoted) {
        levels(lv + 1)(d) = items(srcIdx)
        srcIdx += 2
        d += 1
        p += 1
      }
      sizes(lv + 1) = d
      // re-sort the receiving level to keep invariant
      java.util.Arrays.sort(levels(lv + 1), 0, sizes(lv + 1))
      // odd count: the unpaired last item stays at this level so total
      // weight is conserved exactly (sum over levels of size*2^level == n)
      if ((m & 1) == 1) { levels(lv)(0) = items(m - 1); sizes(lv) = 1 }
      else sizes(lv) = 0
    }
  }

  def merge(other: Kll): Unit = {
    require(other.k == k, s"KLL k mismatch: $k vs ${other.k}")
    if (other.n == 0) return
    while (levels.length < other.levels.length) growLevels()
    var lv = 0
    while (lv < other.levels.length) {
      val m = other.sizes(lv)
      if (m > 0) {
        val need = sizes(lv) + m
        if (need > levels(lv).length)
          levels(lv) = java.util.Arrays.copyOf(levels(lv), math.max(need, levels(lv).length * 2))
        System.arraycopy(other.levels(lv), 0, levels(lv), sizes(lv), m)
        sizes(lv) = need
        if (lv > 0) java.util.Arrays.sort(levels(lv), 0, sizes(lv))
      }
      lv += 1
    }
    n += other.n
    if (other.lo < lo) lo = other.lo
    if (other.hi > hi) hi = other.hi
    compress()
  }

  /** Normalized rank of x: fraction of stream weight < x. */
  def rank(x: Double): Double = {
    if (n == 0) return Double.NaN
    var below = 0L
    var lv = 0
    while (lv < levels.length) {
      val w = 1L << lv
      var i = 0
      while (i < sizes(lv)) {
        if (levels(lv)(i) < x) below += w
        i += 1
      }
      lv += 1
    }
    below.toDouble / n
  }

  /** Quantile: smallest retained item whose cumulative weight >= q*n. */
  def quantile(q: Double): Double = {
    if (n == 0) return Double.NaN
    if (q <= 0) return lo
    if (q >= 1) return hi
    // gather (item, weight) pairs
    val ts = totalSize
    val items = new Array[Double](ts)
    val ws = new Array[Long](ts)
    var out = 0
    var lv = 0
    while (lv < levels.length) {
      val w = 1L << lv
      var i = 0
      while (i < sizes(lv)) { items(out) = levels(lv)(i); ws(out) = w; out += 1; i += 1 }
      lv += 1
    }
    val idx = Array.tabulate(out)(identity).sortBy(items(_))
    val target = q * n
    var cum = 0.0
    var j = 0
    while (j < out) {
      cum += ws(idx(j))
      if (cum >= target) return items(idx(j))
      j += 1
    }
    hi
  }

  def toBytes: Array[Byte] = {
    compressForSerde()
    var payload = 0
    var lv = 0
    while (lv < levels.length) { payload += 4 + 8 * sizes(lv); lv += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 4 + 8 + 16 + payload)
    bb.put('K'.toByte).put('L'.toByte).put(1.toByte).put(0.toByte)
    bb.putInt(k).putInt(levels.length)
    bb.put((parity & 1).toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putLong(n).putDouble(lo).putDouble(hi)
    lv = 0
    while (lv < levels.length) {
      val m = sizes(lv)
      java.util.Arrays.sort(levels(lv), 0, m)
      bb.putInt(m)
      var i = 0
      while (i < m) { bb.putDouble(levels(lv)(i)); i += 1 }
      lv += 1
    }
    bb.array()
  }

  /** bound the serialized size before writing. */
  private def compressForSerde(): Unit =
    if (totalSize >= totalCapacity(levels.length)) compress()
}

object Kll {
  final val DefaultK = 200

  def apply(): Kll = new Kll(DefaultK)

  /** capacity of `level` when the sketch currently has `numLevels`:
    * k * (2/3)^(numLevels-1-level), floored, min 8. */
  private[sketch] def levelCap(k: Int, level: Int, numLevels: Int): Int = {
    val depth = numLevels - 1 - level
    math.max((k * math.pow(2.0 / 3.0, depth)).toInt, 8)
  }

  def fromBytes(bytes: Array[Byte]): Kll = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.remaining >= 44, "KLL bytes too short")
    require(bb.get() == 'K' && bb.get() == 'L', "bad KLL magic")
    val ver = bb.get()
    require(ver == 1, s"unsupported KLL version $ver")
    bb.get()
    val k = bb.getInt
    val numLevels = bb.getInt
    val parity = bb.get() & 1
    bb.get(); bb.get(); bb.get()
    val n = bb.getLong
    val lo = bb.getDouble
    val hi = bb.getDouble
    val levels = new Array[Array[Double]](numLevels)
    val sizes = new Array[Int](numLevels)
    var lv = 0
    while (lv < numLevels) {
      val m = bb.getInt
      val arr = new Array[Double](math.max(m, 8))
      var i = 0
      while (i < m) { arr(i) = bb.getDouble; i += 1 }
      levels(lv) = arr
      sizes(lv) = m
      lv += 1
    }
    new Kll(k, levels, sizes, n, lo, hi, parity)
  }

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val ka = fromBytes(a); ka.merge(fromBytes(b)); ka.toBytes
  }
}
