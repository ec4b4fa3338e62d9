package graft.core.vector

import graft.core.hash.XXH3

/**
 * Tight-loop vector kernels for the similarity operators. Spark's
 * higher-order functions (zip_with/aggregate) are CodegenFallback —
 * interpreted per row with per-element boxing — which made cosine over a
 * few million candidate pairs dominate the bench. These static methods are
 * called from codegen'd expressions instead (one JIT-compiled loop per
 * pair, no allocation beyond the primitive array views).
 */
object VectorOps {

  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Mixed float/double cosine (vector column vs centroid row). */
  def cosineFD(a: Array[Float], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  def cosineD(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Deterministic random-hyperplane matrix for an LSH table, memoized per
    * (table, planes, dims). Gaussian entries from Box-Muller over
    * XXH3-derived uniforms — reproducible on every executor with no stored
    * model or broadcast. */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  def planes(table: Int, nPlanes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((table, nPlanes, dims), { key =>
      val (t, p, d) = key
      Array.tabulate(p)(pi => Array.tabulate(d)(di => gaussian(t, pi, di)))
    })

  private def gaussian(table: Int, plane: Int, dim: Int): Double = {
    def u(salt: Int): Double = {
      val b = new Array[Byte](12)
      val v = (table.toLong << 40) ^ (plane.toLong << 20) ^ dim.toLong
      var i = 0
      while (i < 8) { b(i) = (v >>> (8 * i)).toByte; i += 1 }
      b(8) = salt.toByte; b(9) = 42; b(10) = 0x5a; b(11) = salt.toByte
      math.max((XXH3.hash(b) >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
    }
    math.sqrt(-2.0 * math.log(u(1))) * math.cos(2.0 * math.Pi * u(2))
  }

  /** Sign-sketch signature of v under LSH table `table` (low `nPlanes`
    * bits). */
  def lshSigF(v: Array[Float], nPlanes: Int, table: Int): Long = {
    val m = planes(table, nPlanes, v.length)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val row = m(p)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * row(i); i += 1 }
      if (dot >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  def lshSigD(v: Array[Double], nPlanes: Int, table: Int): Long = {
    val m = planes(table, nPlanes, v.length)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val row = m(p)
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i) * row(i); i += 1 }
      if (dot >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}
