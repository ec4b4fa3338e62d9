package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** ScalaCheck properties for the two sequential packing folds (the pure
  * per-bucket kernels behind Packing.packGreedy / packBestFit): on random
  * positive token sequences, every defining invariant must hold — budget
  * cap unless singleton, dense ids, exact cardinality, greedy tightness
  * (the next pack's first doc would not have fit), BFD pairwise
  * unmergeability (any two packs sum past the budget — the waste bound),
  * and determinism. Zero-token items are included: greedy folds them into
  * the current pack, and BFD best-fits them into a full (residual-0) pack
  * so the unmergeability guarantee survives. */
object PackingPropertySpec extends Properties("sequence-packing") {

  private case class Doc(o: Long, tk: Long)

  private def arr(docs: Seq[Doc]): GenericArrayData =
    new GenericArrayData(docs.sortBy(_.o).map(d =>
      new GenericInternalRow(Array[Any](d.o, d.tk))).toArray[Any])

  private def decode(a: GenericArrayData): Seq[(Long, Long, Int)] =
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 3)
      (r.getLong(0), r.getLong(1), r.getInt(2))
    }

  private val genInput: Gen[(Seq[Doc], Long)] = for {
    budget <- Gen.choose(5L, 200L)
    n <- Gen.choose(0, 120)
    tks <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(1L, budget),          // normal docs
      1 -> Gen.choose(budget + 1, 2 * budget), // oversized singletons
      1 -> Gen.const(1L),                   // tiny-doc clusters
      1 -> Gen.const(0L)))                  // zero-token (empty-text) docs
  } yield (tks.zipWithIndex.map { case (t, i) => Doc(i.toLong * 3 + 1, t) }, budget)

  private def packsOf(out: Seq[(Long, Long, Int)], docs: Seq[Doc]): Map[Long, Seq[Doc]] = {
    val byO = docs.map(d => d.o -> d).toMap
    out.groupBy(_._2).view.mapValues(_.map(r => byO(r._1))).toMap
  }

  private def commonInvariants(out: Seq[(Long, Long, Int)], docs: Seq[Doc],
                               budget: Long): Prop = {
    val packs = packsOf(out, docs)
    val cardinality = Prop(out.length == docs.length) :| "every doc packed once"
    val cap = Prop(packs.values.forall(p =>
      p.map(_.tk).sum <= budget || p.length == 1)) :| "cap unless singleton"
    val dense = Prop(packs.isEmpty ||
      packs.keys.toSeq.sorted == (0L until packs.size).toSeq) :| "dense pack ids"
    val positions = Prop(out.groupBy(_._2).values.forall(g =>
      g.map(_._3).sorted == (1 to g.size).toSeq)) :| "pack_pos is 1..n per pack"
    cardinality && cap && dense && positions
  }

  property("greedy: invariants + close-on-overflow tightness") =
    Prop.forAll(genInput) { case (docs, budget) =>
      val out = decode(GreedyPackIds.pack(arr(docs), budget))
      val packs = packsOf(out, docs)
      // tightness: pack p+1's FIRST doc (in order) would overflow pack p
      val firstOf = out.groupBy(_._2).view.mapValues(_.minBy(_._1)).toMap
      val tight = Prop((0L until (packs.size - 1).toLong).forall { p =>
        val total = packs(p).map(_.tk).sum
        val nextFirst = docs.find(_.o == firstOf(p + 1)._1).get.tk
        total + nextFirst > budget
      }) :| "not tight: a pack could absorb its successor's first doc"
      // order preserved: pack ids nondecreasing in doc order
      val ordered = Prop(out.sortBy(_._1).map(_._2) ==
        out.sortBy(_._1).map(_._2).sorted) :| "greedy must preserve order"
      commonInvariants(out, docs, budget) && tight && ordered &&
        (Prop(decode(GreedyPackIds.pack(arr(docs), budget)) == out) :| "deterministic")
    }

  property("best-fit-decreasing: invariants + pairwise unmergeability") =
    Prop.forAll(genInput) { case (docs, budget) =>
      val out = decode(BestFitPackIds.pack(arr(docs), budget))
      val packs = packsOf(out, docs)
      val totals = packs.view.mapValues(_.map(_.tk).sum).values.toSeq
      val unmergeable = Prop(
        (for (i <- totals.indices; j <- i + 1 until totals.size)
          yield totals(i) + totals(j) > budget).forall(identity)) :|
        s"mergeable packs exist: $totals vs $budget"
      // NOTE: "BFD pack count <= order-greedy's" is NOT asserted — it holds
      // on almost every draw but is not a theorem (FFD's 11/9-OPT worst
      // case vs a luckily bin-ordered next-fit sequence); the enforced
      // waste bound is unmergeability, which caps packs at 2*OPT
      commonInvariants(out, docs, budget) && unmergeable &&
        (Prop(decode(BestFitPackIds.pack(arr(docs), budget)) == out) :| "deterministic")
    }
}
