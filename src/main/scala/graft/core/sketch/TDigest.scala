package graft.core.sketch

/**
 * t-digest (Dunning & Ertl, "Computing extremely accurate quantiles using
 * t-digests") — merging variant with the k1 (arcsine) scale function.
 * north_star: "t-digest quantiles of text length".
 *
 * Mergeable: merging two digests concatenates centroid sets and re-clusters
 * under the same scale bound, so partial aggregation across Spark partitions
 * is safe. Merge is associative/commutative up to centroid-boundary jitter;
 * rank accuracy (the published guarantee, O(1/compression) near the median
 * and tighter at the tails) is preserved under any merge order — tests
 * assert the rank-error bound, not byte equality.
 *
 * Wire format: [magic 'T','D', ver 1, pad] [compression f64] [min f64]
 * [max f64] [n i32] + n * (mean f64, weight f64).
 */
final class TDigest private (
    val compression: Double,
    private var means: Array[Double],
    private var weights: Array[Double],
    private var nCentroids: Int,
    private var total: Double,
    private var lo: Double,
    private var hi: Double) {

  def this(compression: Double = TDigest.DefaultCompression) =
    this(compression, new Array[Double](16), new Array[Double](16), 0, 0.0,
      Double.PositiveInfinity, Double.NegativeInfinity)

  require(compression >= 20, s"compression $compression")

  // unmerged insert buffer; flushed when full
  private val bufCap = math.max(64, (compression * 4).toInt)
  private var bufMeans = new Array[Double](bufCap)
  private var bufWeights = new Array[Double](bufCap)
  private var bufN = 0

  def totalWeight: Double = { flush(); total }
  def min: Double = lo
  def max: Double = hi
  def centroidCount: Int = { flush(); nCentroids }

  def add(x: Double, w: Double = 1.0): Unit = {
    if (x.isNaN || w <= 0) return
    if (bufN == bufCap) flush()
    bufMeans(bufN) = x
    bufWeights(bufN) = w
    bufN += 1
    if (x < lo) lo = x
    if (x > hi) hi = x
  }

  def merge(other: TDigest): Unit = {
    require(other.compression == compression,
      s"t-digest compression mismatch: $compression vs ${other.compression}")
    other.flush()
    var i = 0
    while (i < other.nCentroids) { add(other.means(i), other.weights(i)); i += 1 }
    if (other.lo < lo) lo = other.lo
    if (other.hi > hi) hi = other.hi
  }

  /** k1 scale: k(q) = compression/(2*pi) * asin(2q - 1). */
  @inline private def scaleK(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(math.max(q, 0.0), 1.0) - 1.0)

  private def flush(): Unit = {
    if (bufN == 0) return
    // gather existing centroids + buffer, sort by mean, re-cluster
    val n = nCentroids + bufN
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    System.arraycopy(means, 0, ms, 0, nCentroids)
    System.arraycopy(weights, 0, ws, 0, nCentroids)
    System.arraycopy(bufMeans, 0, ms, nCentroids, bufN)
    System.arraycopy(bufWeights, 0, ws, nCentroids, bufN)
    bufN = 0
    sortPairs(ms, ws, n)
    var w = 0.0
    var i = 0
    while (i < n) { w += ws(i); i += 1 }
    total = w

    val outM = new Array[Double](n)
    val outW = new Array[Double](n)
    var out = 0
    var wSoFar = 0.0
    var curM = ms(0)
    var curW = ws(0)
    var kLeft = scaleK(0.0)
    i = 1
    while (i < n) {
      val proposed = curW + ws(i)
      val qRight = (wSoFar + proposed) / w
      if (scaleK(qRight) - kLeft <= 1.0) {
        // absorb into current centroid (weighted mean)
        curM += (ms(i) - curM) * ws(i) / proposed
        curW = proposed
      } else {
        outM(out) = curM; outW(out) = curW; out += 1
        wSoFar += curW
        kLeft = scaleK(wSoFar / w)
        curM = ms(i); curW = ws(i)
      }
      i += 1
    }
    outM(out) = curM; outW(out) = curW; out += 1
    means = outM; weights = outW; nCentroids = out
  }

  /** in-place quicksort of parallel arrays keyed by mean (allocation-free —
    * flush() runs once per bufCap adds, so this is the add() hot path). */
  private def sortPairs(ms: Array[Double], ws: Array[Double], n: Int): Unit =
    qsort(ms, ws, 0, n - 1)

  private def qsort(ms: Array[Double], ws: Array[Double], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      if (hi - lo < 12) { // insertion sort for small ranges
        var i = lo + 1
        while (i <= hi) {
          val m = ms(i); val w = ws(i)
          var j = i - 1
          while (j >= lo && ms(j) > m) { ms(j + 1) = ms(j); ws(j + 1) = ws(j); j -= 1 }
          ms(j + 1) = m; ws(j + 1) = w
          i += 1
        }
        return
      }
      // median-of-three pivot
      val mid = (lo + hi) >>> 1
      if (ms(mid) < ms(lo)) swap(ms, ws, lo, mid)
      if (ms(hi) < ms(lo)) swap(ms, ws, lo, hi)
      if (ms(hi) < ms(mid)) swap(ms, ws, mid, hi)
      val pivot = ms(mid)
      var i = lo
      var j = hi
      while (i <= j) {
        while (ms(i) < pivot) i += 1
        while (ms(j) > pivot) j -= 1
        if (i <= j) { swap(ms, ws, i, j); i += 1; j -= 1 }
      }
      // recurse into smaller side, loop on larger (bounded stack)
      if (j - lo < hi - i) { qsort(ms, ws, lo, j); lo = i }
      else { qsort(ms, ws, i, hi); hi = j }
    }
  }

  @inline private def swap(ms: Array[Double], ws: Array[Double], a: Int, b: Int): Unit = {
    val tm = ms(a); ms(a) = ms(b); ms(b) = tm
    val tw = ws(a); ws(a) = ws(b); ws(b) = tw
  }

  /** Quantile estimate by piecewise-linear interpolation over centroid
    * midpoints, with min/max as the exact endpoints. */
  def quantile(q: Double): Double = {
    flush()
    if (nCentroids == 0) return Double.NaN
    if (nCentroids == 1) return means(0)
    val target = math.min(math.max(q, 0.0), 1.0) * total
    val firstMid = weights(0) / 2
    if (target <= firstMid)
      return lo + (means(0) - lo) * target / firstMid
    var cum = 0.0
    var i = 0
    while (i < nCentroids - 1) {
      val mid = cum + weights(i) / 2
      val nextMid = cum + weights(i) + weights(i + 1) / 2
      if (target >= mid && target < nextMid) {
        val frac = (target - mid) / (nextMid - mid)
        return means(i) + (means(i + 1) - means(i)) * frac
      }
      cum += weights(i)
      i += 1
    }
    val lastMid = cum + weights(nCentroids - 1) / 2
    val halfW = weights(nCentroids - 1) / 2
    if (halfW <= 0) return hi
    val tail = (target - lastMid) / halfW
    means(nCentroids - 1) + (hi - means(nCentroids - 1)) * math.min(math.max(tail, 0.0), 1.0)
  }

  /** Fraction of mass <= x (CDF). */
  def cdf(x: Double): Double = {
    flush()
    if (nCentroids == 0) return Double.NaN
    if (x <= lo) return 0.0
    if (x >= hi) return 1.0
    var cum = 0.0
    var i = 0
    while (i < nCentroids) {
      if (x < means(i)) {
        val prevMean = if (i == 0) lo else means(i - 1)
        val prevCum = if (i == 0) 0.0 else cum - weights(i - 1) / 2
        val thisCum = cum + weights(i) / 2
        val frac = (x - prevMean) / (means(i) - prevMean)
        return math.min(math.max((prevCum + (thisCum - prevCum) * frac) / total, 0.0), 1.0)
      }
      cum += weights(i)
      i += 1
    }
    // tail segment (means(last), hi): interpolate toward hi symmetrically
    // with the head — returning a flat 1.0 would jump by up to half the
    // last centroid's weight fraction at x = means(last)
    val lastMean = means(nCentroids - 1)
    if (hi > lastMean) {
      val prevCum = total - weights(nCentroids - 1) / 2
      val frac = (x - lastMean) / (hi - lastMean)
      math.min(math.max((prevCum + (total - prevCum) * frac) / total, 0.0), 1.0)
    } else 1.0
  }

  def toBytes: Array[Byte] = {
    flush()
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * 3 + 4 + 16 * nCentroids)
    bb.put('T'.toByte).put('D'.toByte).put(1.toByte).put(0.toByte)
    bb.putDouble(compression).putDouble(lo).putDouble(hi).putInt(nCentroids)
    var i = 0
    while (i < nCentroids) { bb.putDouble(means(i)).putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  final val DefaultCompression = 100.0

  def apply(): TDigest = new TDigest(DefaultCompression)

  def fromBytes(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    require(bb.remaining >= 32, "t-digest bytes too short")
    require(bb.get() == 'T' && bb.get() == 'D', "bad t-digest magic")
    val ver = bb.get()
    require(ver == 1, s"unsupported t-digest version $ver")
    bb.get()
    val compression = bb.getDouble
    val lo = bb.getDouble
    val hi = bb.getDouble
    val n = bb.getInt
    require(bb.remaining == 16 * n, "t-digest payload size mismatch")
    val d = new TDigest(compression)
    var i = 0
    while (i < n) { d.add(bb.getDouble, bb.getDouble); i += 1 }
    if (n > 0) { // restore exact observed extremes
      if (lo < d.lo) d.lo = lo
      if (hi > d.hi) d.hi = hi
    }
    d
  }

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val da = fromBytes(a); da.merge(fromBytes(b)); da.toBytes
  }
}
