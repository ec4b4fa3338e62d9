package graft.core.sketch

import org.scalatest.funsuite.AnyFunSuite

/** Error-bound + mergeability tests for the CM / Bloom / t-digest / KLL
  * families (no reference bytes exist for these — the contract is the
  * published guarantees plus merge associativity). */
class SketchSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  // ---------------- Count-Min ----------------

  test("CountMin: overestimates only, within eps*N; merge = sum; roundtrip") {
    val rnd = new java.util.Random(1)
    val keys = Array.fill(2000)(rnd.nextLong())
    val truth = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    val cm = CountMin()
    // zipf-ish: key i added (2000/(i+1)) times
    keys.zipWithIndex.foreach { case (k, i) =>
      val c = 2000L / (i + 1)
      if (c > 0) { cm.update(k, c); truth.put(k, c) }
    }
    val total = cm.totalCount
    assert(total === truth.values().stream().mapToLong(_.longValue).sum())
    val eps = math.E / cm.width
    var violations = 0
    keys.foreach { k =>
      val est = cm.estimate(k)
      val tr = truth.getOrDefault(k, 0L)
      assert(est >= tr, s"CM must never underestimate (key $k)")
      if (est - tr > eps * total) violations += 1
    }
    // delta = e^-depth ~ 0.7%; allow a small number of violations
    assert(violations <= keys.length / 50, s"$violations eps-violations")
    // merge = building from the union stream
    val cmA = CountMin(); val cmB = CountMin()
    keys.take(1000).foreach(k => cmA.update(k, 3))
    keys.drop(1000).foreach(k => cmB.update(k, 5))
    val merged = CountMin.fromBytes(CountMin.mergeBytes(cmA.toBytes, cmB.toBytes))
    val direct = CountMin()
    keys.take(1000).foreach(k => direct.update(k, 3))
    keys.drop(1000).foreach(k => direct.update(k, 5))
    assert(hex(merged.toBytes) === hex(direct.toBytes))
    // dims mismatch rejected
    assertThrows[IllegalArgumentException] {
      CountMin().merge(new CountMin(4, 1024))
    }
  }

  // ---------------- Bloom ----------------

  test("Bloom: no false negatives; FPP near published bound; merge = OR") {
    val rnd = new java.util.Random(2)
    val present = Array.fill(100000)(rnd.nextLong())
    val bf = BloomFilter()
    present.foreach(bf.add)
    present.foreach(k => assert(bf.mightContain(k), "false negative!"))
    var fp = 0
    val probes = 100000
    (0 until probes).foreach { _ =>
      if (bf.mightContain(rnd.nextLong())) fp += 1
    }
    val fpp = fp.toDouble / probes
    // expected (1 - e^(-kn/m))^k ~ 0.68% at n=1e5, m=2^20, k=7
    assert(fpp < 0.02, s"fpp $fpp")
    // merge = OR; byte-identical to single-pass build
    val a = BloomFilter(); val b = BloomFilter()
    present.take(50000).foreach(a.add)
    present.drop(50000).foreach(b.add)
    assert(hex(BloomFilter.mergeBytes(a.toBytes, b.toBytes)) === hex(bf.toBytes))
    // idempotent
    assert(hex(BloomFilter.mergeBytes(a.toBytes, a.toBytes)) === hex(a.toBytes))
  }

  // ---------------- t-digest ----------------

  test("TDigest: rank error small; mergeable across any split; roundtrip") {
    val rnd = new java.util.Random(3)
    val n = 100000
    val data = Array.fill(n)(math.exp(rnd.nextGaussian())) // lognormal
    val sorted = data.sorted
    def trueQuantile(q: Double): Double = sorted(((n - 1) * q).toInt)

    val whole = TDigest()
    data.foreach(x => whole.add(x))
    // split into 7 digests, merge pairwise in a skewed tree
    val parts = data.grouped(15000).map { chunk =>
      val d = TDigest(); chunk.foreach(x => d.add(x)); d
    }.toList
    val merged = parts.reduceLeft { (a, b) => a.merge(b); a }

    for (d <- Seq(whole, merged, TDigest.fromBytes(merged.toBytes));
         q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = d.quantile(q)
      // translate to rank error via the true CDF (empirical)
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) < 0.015, s"q=$q est=$est rank=$rank")
    }
    assert(whole.quantile(0.0) === data.min)
    assert(whole.quantile(1.0) === data.max)
    assert(math.abs(whole.totalWeight - n) < 1e-9)
    // bounded size: centroid count stays O(compression)
    assert(whole.centroidCount < 2 * 100 + 10)
    assertThrows[IllegalArgumentException] {
      TDigest().merge(new TDigest(200))
    }
  }

  test("TDigest: cdf agrees with quantile; empty/NaN handling") {
    val d = TDigest()
    assert(d.quantile(0.5).isNaN)
    d.add(Double.NaN) // ignored
    d.add(5.0)
    assert(d.quantile(0.5) === 5.0)
    (1 to 1000).foreach(i => d.add(i.toDouble))
    val med = d.quantile(0.5)
    assert(math.abs(d.cdf(med) - 0.5) < 0.02)
  }

  test("TDigest: cdf tail interpolates toward hi (no discontinuous jump)") {
    val d = TDigest()
    (1 to 1000).foreach(i => d.add(i.toDouble))
    // walk x through the tail segment: cdf must be monotone and continuous
    // (the old code returned a flat 1.0 for any x past the last mean)
    val xs = (9900 to 10000).map(_ / 10.0)
    val cdfs = xs.map(d.cdf)
    assert(cdfs.zip(cdfs.tail).forall { case (a, b) => b >= a }, "monotone")
    assert(d.cdf(1000.0) === 1.0)
    // just past the last centroid mean, cdf must NOT already be 1.0
    val lastMean = xs.map(identity).head
    assert(d.cdf(lastMean) < 1.0, s"cdf($lastMean) jumped to 1.0")
    // continuity at the last mean: values straddling it stay close
    val eps = 1e-6
    val below = d.cdf(999.0 - eps)
    val above = d.cdf(999.0 + eps)
    assert(math.abs(above - below) < 1e-3, s"jump at tail: $below -> $above")
  }

  test("Bloom/CountMin fromBytes validates headers before allocating") {
    // 8-byte input claiming log2Bits=36 previously attempted an 8 GiB alloc
    val bloomAttack = Array[Byte]('B', 'F', 1, 7, 36, 0, 0, 0)
    val e1 = intercept[IllegalArgumentException](BloomFilter.fromBytes(bloomAttack))
    assert(e1.getMessage.contains("log2Bits"))

    val bb = java.nio.ByteBuffer.allocate(9)
    bb.put('C'.toByte).put('M'.toByte).put(1.toByte).put(64.toByte).putInt(Int.MaxValue)
    val e2 = intercept[IllegalArgumentException](CountMin.fromBytes(bb.array()))
    assert(e2.getMessage.contains("CountMin"))
  }

  // ---------------- KLL ----------------

  test("Kll: rank error within ~1.65/k bound; merge across splits; roundtrip") {
    val rnd = new java.util.Random(4)
    val n = 200000
    val data = Array.fill(n)(rnd.nextDouble() * 1000)
    val sorted = data.sorted

    val whole = Kll()
    data.foreach(whole.update)
    val parts = data.grouped(30000).map { chunk =>
      val s = Kll(); chunk.foreach(s.update); s
    }.toList
    val merged = parts.reduceLeft { (a, b) => a.merge(b); a }

    for (s <- Seq(whole, merged, Kll.fromBytes(merged.toBytes));
         q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      val est = s.quantile(q)
      val rank = sorted.count(_ <= est).toDouble / n
      // 1.65/k = 0.825% at k=200; allow 2x for the merged tree
      assert(math.abs(rank - q) < 0.0165 * 2, s"q=$q est=$est rank=$rank")
    }
    assert(whole.count === n)
    assert(merged.count === n)
    assert(whole.quantile(0.0) === data.min)
    assert(whole.quantile(1.0) === data.max)
    // serialized size stays small (sub-linear): < 64 KiB for 200k items
    assert(whole.toBytes.length < 65536, s"serialized ${whole.toBytes.length}")
    assertThrows[IllegalArgumentException] { Kll().merge(new Kll(100)) }
  }

  test("Kll: rank() is the inverse view of quantile()") {
    val s = Kll()
    (1 to 10000).foreach(i => s.update(i.toDouble))
    assert(math.abs(s.rank(5000.0) - 0.5) < 0.02)
    assert(s.rank(0.0) === 0.0)
    assert(math.abs(s.rank(10001.0) - 1.0) < 1e-9)
  }
}
