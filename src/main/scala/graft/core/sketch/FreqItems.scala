package graft.core.sketch

import java.nio.ByteBuffer

/**
 * Misra–Gries frequent-items ("heavy hitters") sketch over pre-hashed
 * 64-bit keys with long weights (Misra & Gries 1982; mergeable form per
 * Agarwal et al. 2012, "Mergeable Summaries", §3). Generalizes the
 * reference's exact per-domain `queries_count` table
 * (/root/reference/internal/dataset.go:46) — which is unbounded in the
 * number of domains — into fixed memory: at most k counters, with a
 * tracked error bound.
 *
 * Invariants (n = total weight added across all merged inputs):
 * - every stored count is an UNDER-estimate: stored <= true;
 * - the undercount is bounded by `errBound`: true <= stored + errBound;
 * - errBound <= n / (k+1) (each decrement of d removes >= (k+1)*d weight);
 * - coverage: any key with true count > errBound is present in the sketch
 *   (absent keys have true <= errBound).
 * When no decrement has ever fired (distinct keys <= k everywhere,
 * including every pre-merge partial), errBound == 0 and every stored
 * count is EXACT — the property the deterministic oracle gate pins.
 *
 * - `update(hash, w)`: add w; on overflow past k counters subtract the
 *   minimum count from all (the (k+1)-th largest of k+1), drop zeros.
 * - `merge`: sum counts per key, add error bounds; if over k counters
 *   subtract the (k+1)-th largest count, drop non-positive, add it to the
 *   error bound. Associative in the bounds (contents may differ by merge
 *   order, the guarantees never do).
 *
 * Wire format: ['F','Q', ver 1, 0] [k i32 BE] [errBound i64 BE] [m i32 BE]
 * [m * (hash i64, count i64) BE, hash unsigned-ascending]. Sorted
 * serialization makes equal states byte-identical.
 */
final class FreqItems private (
    val k: Int,
    private val map: java.util.HashMap[java.lang.Long, java.lang.Long],
    private var err: Long) extends Serializable {

  def this(k: Int = FreqItems.DefaultK) =
    this(k, new java.util.HashMap[java.lang.Long, java.lang.Long](), 0L)

  require(k >= 1, s"freq_items k must be >= 1, got $k")

  /** Upper bound on how much any stored (or absent) count may undercount. */
  def errBound: Long = err

  /** Number of counters currently held (<= k). */
  def size: Int = map.size

  def update(hash: Long, weight: Long): Unit = {
    if (weight <= 0) return
    val prev = map.get(hash)
    map.put(hash, if (prev == null) weight else prev + weight)
    if (map.size > k) decrementByMin()
  }

  /** Subtract the minimum count (the (k+1)-th largest of k+1 entries) from
    * every entry and drop the zeros; charge it to the error bound. */
  private def decrementByMin(): Unit = {
    var min = Long.MaxValue
    val it0 = map.values().iterator()
    while (it0.hasNext) { val v = it0.next(); if (v < min) min = v }
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - min
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
    err += min
  }

  def merge(other: FreqItems): Unit = {
    require(other.k == k, s"freq_items k mismatch: $k vs ${other.k}")
    err += other.err
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = map.get(e.getKey)
      map.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    if (map.size > k) {
      // (k+1)-th largest count (Agarwal et al. 2012 merge step); with more
      // than one overflow entry this one pass restores size <= k
      val counts = new Array[Long](map.size)
      var i = 0
      val vit = map.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      val eit = map.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - d
        if (nv <= 0) eit.remove() else e.setValue(nv)
      }
      err += d
    }
  }

  /** (hash, count) pairs, hash unsigned-ascending — deterministic for a
    * given counter state. */
  def items: Array[(Long, Long)] = {
    val hashes = new Array[Long](map.size)
    var i = 0
    val it = map.keySet().iterator()
    while (it.hasNext) { hashes(i) = it.next(); i += 1 }
    // unsigned sort: flip the sign bit, sort signed, flip back
    i = 0
    while (i < hashes.length) { hashes(i) = hashes(i) ^ Long.MinValue; i += 1 }
    java.util.Arrays.sort(hashes)
    i = 0
    while (i < hashes.length) { hashes(i) = hashes(i) ^ Long.MinValue; i += 1 }
    hashes.map(h => (h, map.get(h).longValue()))
  }

  /** Stored (lower-bound) count for a key; 0 if absent. */
  def lowerBound(hash: Long): Long = {
    val v = map.get(hash)
    if (v == null) 0L else v.longValue()
  }

  def toBytes: Array[Byte] = {
    val its = items
    val buf = ByteBuffer.allocate(4 + 4 + 8 + 4 + 16 * its.length)
    buf.put('F'.toByte).put('Q'.toByte).put(1.toByte).put(0.toByte)
    buf.putInt(k).putLong(err).putInt(its.length)
    its.foreach { case (h, c) => buf.putLong(h).putLong(c) }
    buf.array()
  }
}

object FreqItems {
  val DefaultK = 256

  def apply(k: Int = DefaultK): FreqItems = new FreqItems(k)

  def fromBytes(bytes: Array[Byte]): FreqItems = {
    require(bytes.length >= 20 && bytes(0) == 'F' && bytes(1) == 'Q',
      "not a FreqItems sketch: bad magic")
    require(bytes(2) == 1, s"freq_items: unsupported version ${bytes(2)}")
    val buf = ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    val k = buf.getInt()
    val err = buf.getLong()
    val m = buf.getInt()
    require(m >= 0 && m <= k && bytes.length == 20 + 16 * m,
      s"freq_items: corrupt sketch (k=$k m=$m len=${bytes.length})")
    val map = new java.util.HashMap[java.lang.Long, java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      val h = buf.getLong(); val c = buf.getLong()
      require(c > 0, s"freq_items: non-positive stored count $c")
      map.put(h, c)
      i += 1
    }
    new FreqItems(k, map, err)
  }
}
