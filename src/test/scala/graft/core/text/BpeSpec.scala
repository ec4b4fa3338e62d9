package graft.core.text

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class BpeSpec extends AnyFunSuite {

  private def types(text: String): Seq[(Array[Byte], Long)] =
    Bpe.segments(text).toSeq.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (s, g) => (s.getBytes(UTF_8), g.size.toLong) }

  test("segmentation is lossless and attaches spaces to the following segment") {
    assert(Bpe.segments("a b  c").toSeq === Seq("a", " b", " ", " c"))
    assert(Bpe.segments("").toSeq === Seq.empty)
    assert(Bpe.segments("  ").toSeq === Seq(" ", " "))
    for (t <- Seq("a b  c", " lead", "trail ", "one", "", "héllo 汉字"))
      assert(Bpe.segments(t).mkString === t)
  }

  test("training follows hand-computed merge order with deterministic tie-breaks") {
    // corpus "aa aa ab" -> segments "aa", " aa", " ab"
    // pair counts: (a,a)=2, (sp,a)=2, (a,b)=1
    // tie at 2 -> smaller LEFT id wins: (32, 97) before (97, 97)
    val m = Bpe.train(types("aa aa ab"), numMerges = 3, minPairCount = 1)
    // after merge 0 the live pairs are (a,a)=1, (256,a)=1, (256,b)=1:
    // merge 1 -> smallest left (97,97); merge 2 -> left tie at 256,
    // smaller RIGHT wins: (256, 97)
    assert(m.merges.toSeq === Seq((32, 97), (97, 97), (256, 97)))
    val ids = m.encode("aa aa ab")
    // "aa" -> 257; " aa" -> (sp,a)->256 then (256,a)->258; " ab" ->
    // (sp,a)->256 then (256,b) unranked -> [256, 98]
    assert(ids.toSeq === Seq(257, 258, 256, 98))
    assert(m.decode(ids) === "aa aa ab")
  }

  test("minPairCount stops training; zero merges degrade to raw bytes") {
    val m = Bpe.train(types("aa aa ab"), numMerges = 10, minPairCount = 3)
    assert(m.merges.isEmpty)
    assert(m.encode("ab").toSeq === Seq(97, 98))
    assert(m.vocabSize === 256)
  }

  test("space-free scripts segment at the cap: bounded pieces, still lossless") {
    val cjk = "汉" * 200 // no spaces: one raw run of 200 chars
    val segs = Bpe.segments(cjk).toSeq
    assert(segs.forall(_.length <= Bpe.MaxSegmentChars))
    assert(segs.mkString === cjk)
    assert(segs.length === math.ceil(200.0 / Bpe.MaxSegmentChars).toInt)
    // a surrogate pair straddling the cap boundary is never split
    val astral = "x" * (Bpe.MaxSegmentChars - 1) + "😀" + "y" * 10
    val segs2 = Bpe.segments(astral).toSeq
    assert(segs2.mkString === astral)
    assert(segs2.forall(s => !Character.isHighSurrogate(s.last)),
      "a segment must not end mid-surrogate-pair")
    // training on a space-free corpus stays bounded and round-trips
    val m = Bpe.train(types(cjk + " " + cjk.take(97)), 20, 1)
    assert(m.decode(m.encode(cjk)) === cjk)
  }

  test("byte-level roundtrip holds for arbitrary unicode, even off-corpus") {
    val m = Bpe.train(types("the quick brown fox the quick"), 50, 1)
    for (t <- Seq("the quick brown fox", "héllo wörld", "汉字 かな 한글",
        "emoji 😀 ok", "", "  spaces  ", "unseen zzz qqq"))
      assert(m.decode(m.encode(t)) === t, s"roundtrip '$t'")
  }

  test("merges compress the trained corpus and never cross segment boundaries") {
    val corpus = "lower lowest lower lowest newer newest " * 10
    val m = Bpe.train(types(corpus), numMerges = 40, minPairCount = 2)
    val enc = m.encode(corpus)
    assert(enc.length < corpus.getBytes(UTF_8).length / 2,
      s"40 merges on a repetitive corpus must compress >2x, got ${enc.length}")
    // no token's expansion spans a segment boundary (contains an interior space)
    val vocab = m.vocabBytes.map(b => new String(b, UTF_8))
    assert(vocab.forall(v => !v.drop(1).contains(' ')),
      "a merge crossed a segment boundary")
    assert(m.decode(enc) === corpus)
  }

  test("decode rejects out-of-vocab ids") {
    val m = Bpe.train(types("aa ab"), 2, 1)
    intercept[IllegalArgumentException](m.decode(Array(m.vocabSize)))
    intercept[IllegalArgumentException](m.decode(Array(-1)))
  }
}
