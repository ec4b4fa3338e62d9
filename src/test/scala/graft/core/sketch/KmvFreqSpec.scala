package graft.core.sketch

import org.scalatest.funsuite.AnyFunSuite

/** KMV (bottom-k) and Misra-Gries guarantees + mergeability. Like the CM /
  * KLL families these have no reference bytes — the contract is the
  * published bounds, merge associativity, and (new here) the EXACT modes
  * the oracle gates pin: KMV below capacity holds every distinct hash;
  * Misra-Gries with zero decrements stores exact counts. */
class KmvFreqSpec extends AnyFunSuite {

  private def mix(i: Long): Long = { // splitmix64 — uniform test hashes
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // ---------------- KMV ----------------

  test("KMV: exact below capacity; duplicates are no-ops; roundtrip bytes") {
    val s = Kmv(64)
    (0 until 40).foreach(i => s.update(mix(i)))
    (0 until 40).foreach(i => s.update(mix(i))) // dup inserts
    assert(s.size === 40)
    assert(s.estimate === 40.0)
    val rt = Kmv.fromBytes(s.toBytes)
    assert(rt.estimate === 40.0)
    assert(java.util.Arrays.equals(rt.values, s.values))
    assert(rt.toBytes.toSeq === s.toBytes.toSeq)
  }

  test("KMV: estimate within published error at capacity; values sorted unsigned") {
    val k = 512
    val n = 100000
    val s = Kmv(k)
    (0 until n).foreach(i => s.update(mix(i)))
    assert(s.size === k)
    val rel = math.abs(s.estimate - n) / n
    assert(rel < 4.0 / math.sqrt(k - 2), s"relative error $rel")
    val vs = s.values
    vs.sliding(2).foreach { case Array(a, b) =>
      assert(java.lang.Long.compareUnsigned(a, b) < 0)
    }
  }

  test("KMV: merge == build-from-union; associative; idempotent (lattice join)") {
    val a = Kmv(128); val b = Kmv(128); val ab = Kmv(128)
    (0 until 5000).foreach { i => a.update(mix(i)); ab.update(mix(i)) }
    (2500 until 8000).foreach { i => b.update(mix(i)); ab.update(mix(i)) }
    val m = Kmv.fromBytes(a.toBytes)
    m.merge(b)
    assert(m.toBytes.toSeq === ab.toBytes.toSeq)
    // idempotent: re-merging the same sketch changes nothing
    val m2 = Kmv.fromBytes(m.toBytes)
    m2.merge(b)
    assert(m2.toBytes.toSeq === m.toBytes.toSeq)
    // associativity through bytes: (a+b)+c == a+(b+c)
    val c = Kmv(128)
    (6000 until 9000).foreach(i => c.update(mix(i)))
    val left = Kmv.fromBytes(a.toBytes); left.merge(b); left.merge(c)
    val bc = Kmv.fromBytes(b.toBytes); bc.merge(c)
    val right = Kmv.fromBytes(a.toBytes); right.merge(bc)
    assert(left.toBytes.toSeq === right.toBytes.toSeq)
  }

  test("KMV jaccard: exact below capacity, close at capacity") {
    val a = Kmv(256); val b = Kmv(256)
    (0 until 100).foreach(i => a.update(mix(i)))
    (50 until 150).foreach(i => b.update(mix(i)))
    assert(Kmv.jaccard(a, b) === 50.0 / 150.0) // both exact-mode
    val bigA = Kmv(512); val bigB = Kmv(512)
    (0 until 60000).foreach(i => bigA.update(mix(i)))
    (30000 until 90000).foreach(i => bigB.update(mix(i)))
    val est = Kmv.jaccard(bigA, bigB) // true jaccard = 30000/90000 = 1/3
    assert(math.abs(est - 1.0 / 3.0) < 0.08, s"jaccard est $est")
    // empty sketches
    assert(Kmv.jaccard(Kmv(16), Kmv(16)) === 0.0)
    // exact below capacity even when the UNION exceeds k: 700 + 700 with
    // 100 shared (union 1300 > k=1024) must scan the full union, not a
    // k-truncated prefix
    val wideA = Kmv(1024); val wideB = Kmv(1024)
    (0 until 700).foreach(i => wideA.update(mix(i)))
    (600 until 1300).foreach(i => wideB.update(mix(i)))
    assert(Kmv.jaccard(wideA, wideB) === 100.0 / 1300.0)
  }

  test("KMV: k mismatch refuses to merge; corrupt bytes refused") {
    val a = Kmv(64); val b = Kmv(128)
    intercept[IllegalArgumentException] { a.merge(b) }
    intercept[IllegalArgumentException] { Kmv.fromBytes(Array[Byte](1, 2, 3)) }
    val good = Kmv(64); good.update(1L)
    val bad = good.toBytes.dropRight(1)
    intercept[IllegalArgumentException] { Kmv.fromBytes(bad) }
  }

  // ---------------- Misra-Gries ----------------

  test("MG: exact when distinct <= k (err 0), roundtrip, weighted updates") {
    val s = FreqItems(8)
    val counts = Map(1L -> 50L, 2L -> 30L, 3L -> 5L)
    counts.foreach { case (h, c) =>
      (0 until (c / 5).toInt).foreach(_ => s.update(h, 5L))
    }
    assert(s.errBound === 0L)
    assert(s.items.toMap === counts)
    val rt = FreqItems.fromBytes(s.toBytes)
    assert(rt.items.toMap === counts)
    assert(rt.errBound === 0L)
    assert(rt.toBytes.toSeq === s.toBytes.toSeq)
  }

  test("MG: bounds hold under adversarial order; coverage guarantee") {
    // zipf stream over 200 keys through a k=16 sketch, several orders
    val k = 16
    val freqs = (0 until 200).map(i => (mix(i), (2000 / (i + 1)).toLong))
      .filter(_._2 > 0)
    val n = freqs.map(_._2).sum
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new java.util.Random(seed)
      val stream = scala.util.Random.javaRandomToRandom(rnd)
        .shuffle(freqs.flatMap { case (h, c) => Seq.fill(c.toInt)(h) })
      val s = FreqItems(k)
      stream.foreach(h => s.update(h, 1L))
      assert(s.size <= k)
      assert(s.errBound <= n / (k + 1), s"err ${s.errBound} > n/(k+1)")
      val stored = s.items.toMap
      freqs.foreach { case (h, c) =>
        val lo = stored.getOrElse(h, 0L)
        assert(lo <= c, s"stored overestimates key $h")
        assert(c <= lo + s.errBound, s"undercount beyond bound for $h")
        if (c > s.errBound) assert(stored.contains(h), s"heavy key $h missing")
      }
    }
  }

  test("MG: merge keeps bounds and exactness; (k+1)-th-largest step sizes down") {
    val k = 8
    // two disjoint exact sketches whose union overflows k
    val a = FreqItems(k); val b = FreqItems(k)
    (0 until 6).foreach(i => a.update(mix(i), 100L - i))
    (6 until 12).foreach(i => b.update(mix(i), 100L - i))
    val m = FreqItems.fromBytes(a.toBytes)
    m.merge(b)
    assert(m.size <= k)
    val n = (0 until 12).map(i => 100L - i).sum
    assert(m.errBound <= n / (k + 1))
    val stored = m.items.toMap
    (0 until 12).foreach { i =>
      val c = 100L - i
      val lo = stored.getOrElse(mix(i), 0L)
      assert(lo <= c && c <= lo + m.errBound)
    }
    // exact-mode merge: distinct under k on both sides and combined
    val x = FreqItems(32); val y = FreqItems(32)
    (0 until 10).foreach(i => x.update(mix(i), 7L))
    (5 until 15).foreach(i => y.update(mix(i), 3L))
    x.merge(y)
    assert(x.errBound === 0L)
    (0 until 15).foreach { i =>
      val want = (if (i < 10) 7L else 0L) + (if (i >= 5) 3L else 0L)
      assert(x.lowerBound(mix(i)) === want)
    }
  }

  test("MG: k mismatch and corrupt bytes refused; non-positive weights ignored") {
    val a = FreqItems(8); val b = FreqItems(16)
    intercept[IllegalArgumentException] { a.merge(b) }
    intercept[IllegalArgumentException] { FreqItems.fromBytes(Array[Byte]('F', 'Q', 1)) }
    val s = FreqItems(4)
    s.update(1L, 0L); s.update(1L, -5L)
    assert(s.size === 0)
  }
}
