package graft.core.sketch

import java.nio.ByteBuffer

/**
 * KMV ("k minimum values" / bottom-k) distinct sketch (Bar-Yossef et al.
 * 2002; Beyer et al. 2007 unbiased estimator) over pre-hashed 64-bit keys.
 * Complements the HLL family (the reference's cardinality core,
 * /root/reference/internal/hll/hll.go): where HLL gives the smallest
 * bytes-per-estimate, KMV is *deterministic in its contents* — the sketch
 * IS the k unsigned-smallest distinct hashes, so beyond cardinality it
 * doubles as
 *   - a mergeable uniform sample of the distinct keys (bottom-k by a fixed
 *     hash is coordinated sampling: the same keys win everywhere), and
 *   - a set-operation estimator: two sketches' bottom-k sets support
 *     Jaccard / intersection estimates (min-wise coordination), which HLL
 *     only reaches through inclusion-exclusion noise.
 *
 * - `update(hash)`: insert if unsigned-smaller than the current k-th min
 *   (or the sketch is not yet full); duplicates are no-ops.
 * - `estimate`: exact size while < k values are held (the sketch has seen
 *   every distinct hash); otherwise the order-statistic estimate
 *   (k-1) * 2^64 / kthMin — unbiased for uniform hashes, relative standard
 *   error ~ 1/sqrt(k-2).
 * - `merge`: union the sets, keep the k unsigned-smallest. Associative,
 *   commutative, idempotent (a lattice join — re-merging the same sketch
 *   is harmless, which matters for resume/replay paths).
 *
 * Wire format: ['K','M', ver 1, 0] [k i32 BE] [m i32 BE] [m hashes i64 BE,
 * unsigned-ascending]. Sorted serialization makes equal sketch states
 * byte-identical regardless of insertion order.
 */
final class Kmv private (val k: Int, private val set: java.util.TreeSet[java.lang.Long])
    extends Serializable {

  def this(k: Int = Kmv.DefaultK) =
    this(k, new java.util.TreeSet[java.lang.Long](Kmv.UnsignedOrder))

  require(k >= 2, s"kmv k must be >= 2, got $k")

  /** Number of hashes currently held (<= k). */
  def size: Int = set.size

  def update(hash: Long): Unit = {
    if (set.size < k) { set.add(hash); () }
    else {
      val kth = set.last()
      if (java.lang.Long.compareUnsigned(hash, kth) < 0 && set.add(hash)) {
        set.remove(set.last())
      }
    }
  }

  /** The held hashes, unsigned ascending. */
  def values: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def estimate: Double =
    if (set.size < k) set.size.toDouble
    else (k - 1).toDouble * Kmv.TwoPow64 / Kmv.unsignedToDouble(set.last())

  def merge(other: Kmv): Unit = {
    require(other.k == k, s"kmv k mismatch: $k vs ${other.k}")
    val it = other.set.iterator()
    while (it.hasNext) update(it.next())
  }

  def toBytes: Array[Byte] = {
    val m = set.size
    val buf = ByteBuffer.allocate(4 + 4 + 4 + 8 * m)
    buf.put('K'.toByte).put('M'.toByte).put(1.toByte).put(0.toByte)
    buf.putInt(k).putInt(m)
    val it = set.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }
}

object Kmv {
  val DefaultK = 1024
  private[sketch] val TwoPow64: Double = math.pow(2.0, 64) // exact in IEEE double

  private[sketch] val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    new java.util.Comparator[java.lang.Long] with Serializable {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    }

  private[sketch] def unsignedToDouble(v: Long): Double =
    if (v >= 0) v.toDouble else TwoPow64 + v.toDouble

  def apply(k: Int = DefaultK): Kmv = new Kmv(k)

  def fromBytes(bytes: Array[Byte]): Kmv = {
    require(bytes.length >= 12 && bytes(0) == 'K' && bytes(1) == 'M',
      "not a KMV sketch: bad magic")
    require(bytes(2) == 1, s"kmv: unsupported version ${bytes(2)}")
    val buf = ByteBuffer.wrap(bytes, 4, bytes.length - 4)
    val k = buf.getInt()
    val m = buf.getInt()
    require(m >= 0 && m <= k && bytes.length == 12 + 8 * m,
      s"kmv: corrupt sketch (k=$k m=$m len=${bytes.length})")
    val s = new Kmv(k)
    var i = 0
    while (i < m) { s.update(buf.getLong()); i += 1 }
    s
  }

  /**
   * Jaccard estimate between two sketches (Beyer et al. 2007 §5 /
   * min-wise coordination): over the k' unsigned-smallest hashes of the
   * UNION (k' = min of the sketch sizes capped at min(k_a, k_b)), the
   * fraction present in both bottom-k sets estimates |A∩B| / |A∪B|.
   * Exact whenever both sketches are below capacity (each holds its full
   * distinct set).
   */
  def jaccard(a: Kmv, b: Kmv): Double = {
    val av = a.values
    val bv = b.values
    if (av.isEmpty && bv.isEmpty) return 0.0
    // A below-capacity sketch holds its ENTIRE distinct set, so its whole
    // range is trustworthy; an at-capacity sketch is only complete below
    // its k-th min. The union prefix may extend to the smallest such
    // horizon — unbounded when BOTH sketches are below capacity, which is
    // what makes the estimate exact there (the full union is scanned).
    val kPrime = math.min(
      if (a.size < a.k) Int.MaxValue else a.k,
      if (b.size < b.k) Int.MaxValue else b.k)
    // merge the two sorted arrays, counting union prefix + both-membership
    var i = 0; var j = 0; var union = 0; var both = 0
    while ((i < av.length || j < bv.length) && union < kPrime) {
      val cmp =
        if (i >= av.length) 1
        else if (j >= bv.length) -1
        else java.lang.Long.compareUnsigned(av(i), bv(j))
      if (cmp == 0) { both += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
      union += 1
    }
    if (union == 0) 0.0 else both.toDouble / union.toDouble
  }
}
