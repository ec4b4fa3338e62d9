package graft.core.sketch

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property tests: the merge-algebra guarantees the north_rule
  * demands ("proven merge associativity") hold for arbitrary inputs, not
  * just fixtures. Run by sbt's native ScalaCheck integration. */
object SketchPropertySpec extends Properties("sketch") {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  private val hashSets: Gen[List[Long]] =
    Gen.choose(0, 400).flatMap(n => Gen.listOfN(n, Gen.long))

  property("hll union associative+commutative+idempotent, byte-level") =
    Prop.forAll(hashSets, hashSets, hashSets) { (xs, ys, zs) =>
      def build(l: List[Long]) = { val h = Hll(); l.foreach(h.addRaw); h.toBytes }
      val (a, b, c) = (build(xs), build(ys), build(zs))
      val ab_c = Hll.unionBytes(Hll.unionBytes(a, b), c)
      val a_bc = Hll.unionBytes(a, Hll.unionBytes(b, c))
      hex(ab_c) == hex(a_bc) &&
        hex(Hll.unionBytes(a, b)) == hex(Hll.unionBytes(b, a)) &&
        hex(Hll.unionBytes(a, a)) == hex(a) &&
        hex(ab_c) == hex(build(xs ++ ys ++ zs)) // union == build-on-concat
    }

  property("hll serialization roundtrips") = Prop.forAll(hashSets) { xs =>
    val h = Hll(); xs.foreach(h.addRaw)
    val back = Hll.fromBytes(h.toBytes)
    back.estimate == h.estimate && hex(back.toBytes) == hex(h.toBytes)
  }

  private val cmEntries: Gen[List[(Long, Long)]] =
    Gen.choose(0, 150).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 50L), Gen.choose(1L, 20L))))

  property("count-min merge == build-on-union; never underestimates") =
    Prop.forAll(cmEntries, cmEntries) { (xs, ys) =>
      def build(l: List[(Long, Long)]) = {
        val c = CountMin(); l.foreach { case (k, n) => c.update(k, n) }; c
      }
      val merged = CountMin.fromBytes(
        CountMin.mergeBytes(build(xs).toBytes, build(ys).toBytes))
      val direct = build(xs ++ ys)
      val truth = (xs ++ ys).groupBy(_._1).view.mapValues(_.map(_._2).sum)
      hex(merged.toBytes) == hex(direct.toBytes) &&
        truth.forall { case (k, n) => merged.estimate(k) >= n }
    }

  property("bloom has no false negatives under merge") =
    Prop.forAll(hashSets, hashSets) { (xs, ys) =>
      val a = BloomFilter(); xs.foreach(a.add)
      val b = BloomFilter(); ys.foreach(b.add)
      val merged = BloomFilter.fromBytes(BloomFilter.mergeBytes(a.toBytes, b.toBytes))
      (xs ++ ys).forall(merged.mightContain)
    }

  private val doubleLists: Gen[List[Double]] =
    Gen.choose(0, 500).flatMap(n => Gen.listOfN(n, Gen.choose(-1e6, 1e6)))

  property("kll/tdigest conserve count and extremes under merge") =
    Prop.forAll(doubleLists, doubleLists) { (xs, ys) =>
      val ka = Kll(); xs.foreach(ka.update)
      val kb = Kll(); ys.foreach(kb.update)
      ka.merge(kb)
      val ta = TDigest(); xs.foreach(x => ta.add(x))
      val tb = TDigest(); ys.foreach(x => tb.add(x))
      ta.merge(tb)
      val all = xs ++ ys
      val countsOk = ka.count == all.length &&
        math.abs(ta.totalWeight - all.length) < 1e-6
      val extremesOk = all.isEmpty ||
        (ka.quantile(0.0) == all.min && ka.quantile(1.0) == all.max &&
         ta.quantile(0.0) == all.min && ta.quantile(1.0) == all.max)
      countsOk && extremesOk
    }
}
