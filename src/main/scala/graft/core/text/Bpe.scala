package graft.core.text

import scala.collection.mutable

/** Byte-level byte-pair encoding (Sennrich et al. 2016; byte-level base
  * vocabulary per Radford et al. 2019 so NO input can ever be OOV —
  * `decode(encode(text)) == text` holds for arbitrary Unicode, which is
  * the invariant the `q_bpe_tokenize` gate enforces corpus-wide).
  *
  * Scale split (how the 100-TB story works):
  *  - The CORPUS-sized work — segment-frequency counting — is a Spark
  *    `groupBy` in [[graft.operators.Tokenize.trainBpe]]; one shuffle of
  *    (distinct segment, count) pairs.
  *  - The merge LOOP here is driver-side over the bounded segment-TYPE
  *    table (the fastBPE / HuggingFace-tokenizers design: training cost
  *    depends on distinct word shapes, not corpus tokens). It updates
  *    pair counts incrementally via an occurrence index — each merge
  *    touches only the types that contain the merged pair — so vocab
  *    builds are O(types-affected), not O(merges * all-types).
  *
  * Segmentation: a new segment starts at every space, the space staying
  * attached to the FOLLOWING segment (GPT-2 convention, simplified).
  * Concatenating segments reproduces the text exactly; merges never
  * cross a segment boundary, which bounds token length and keeps the
  * encode loop local.
  *
  * Ids: 0..255 are raw bytes; merge i produces id 256 + i.
  */
final case class BpeModel(merges: Array[(Int, Int)]) extends Serializable {
  import Bpe.pairKey

  def vocabSize: Int = 256 + merges.length

  /** (left, right) -> merge rank; lower rank merges first. */
  @transient private lazy val rank: java.util.HashMap[java.lang.Long, Integer] = {
    val m = new java.util.HashMap[java.lang.Long, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(pairKey(merges(i)._1, merges(i)._2), i)
      i += 1
    }
    m
  }

  /** id -> UTF-8 bytes it expands to. */
  @transient lazy val vocabBytes: Array[Array[Byte]] = {
    val v = new Array[Array[Byte]](vocabSize)
    var i = 0
    while (i < 256) { v(i) = Array((i & 0xff).toByte); i += 1 }
    while (i < vocabSize) {
      val (l, r) = merges(i - 256)
      v(i) = v(l) ++ v(r)
      i += 1
    }
    v
  }

  /** Greedy encode of one segment's UTF-8 bytes: repeatedly apply the
    * LOWEST-rank pair present (all its occurrences, left to right) —
    * the standard BPE inference loop. Segments are short (words), so the
    * scan-per-merge loop is effectively linear in practice. */
  def encodeSegment(bytes: Array[Byte]): Array[Int] = {
    var ids = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { ids(i) = bytes(i) & 0xff; i += 1 }
    while (ids.length >= 2) {
      var best = Int.MaxValue
      var bl = 0; var br = 0
      i = 0
      while (i < ids.length - 1) {
        val r = rank.get(pairKey(ids(i), ids(i + 1)))
        if (r != null && r < best) { best = r; bl = ids(i); br = ids(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) return ids
      val newId = 256 + best
      val out = new Array[Int](ids.length)
      var o = 0
      i = 0
      while (i < ids.length) {
        if (i < ids.length - 1 && ids(i) == bl && ids(i + 1) == br) {
          out(o) = newId; o += 1; i += 2
        } else { out(o) = ids(i); o += 1; i += 1 }
      }
      ids = java.util.Arrays.copyOf(out, o)
    }
    ids
  }

  def encode(text: String): Array[Int] = {
    val out = mutable.ArrayBuilder.make[Int]
    Bpe.segments(text).foreach { seg =>
      out ++= encodeSegment(seg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    out.result()
  }

  def decode(ids: Array[Int]): String = {
    val bb = new java.io.ByteArrayOutputStream(ids.length * 2)
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      require(id >= 0 && id < vocabSize, s"bpe decode: id $id outside vocab [0, $vocabSize)")
      bb.write(vocabBytes(id))
      i += 1
    }
    new String(bb.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  // Array field -> structural equality, so plan canonicalization treats
  // two expressions over the same trained model as equal.
  override def equals(o: Any): Boolean = o match {
    case BpeModel(m) => java.util.Arrays.equals(
      m.asInstanceOf[Array[AnyRef]], merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])
}

object Bpe {
  private[text] def pairKey(l: Int, r: Int): Long = (l.toLong << 32) | (r.toLong & 0xffffffffL)

  /** Space-free scripts (CJK, Thai, ...) produce no space boundaries, so
    * a raw space-split would make one document ONE segment: encode's
    * scan-per-merge loop goes quadratic in document length and every
    * distinct document becomes a distinct training type. Segments are
    * therefore also capped at this many chars (GPT-2 solves the same
    * problem with its regex pre-split; a fixed cap keeps the segmenter
    * dependency-free and deterministic). 48 chars bounds a segment at
    * <= 192 UTF-8 bytes — far above any natural space-delimited word, so
    * Latin-script segmentation is unchanged. */
  val MaxSegmentChars = 48

  /** Lossless segmentation: a new segment starts at every space; the
    * space belongs to the segment it starts. Runs longer than
    * [[MaxSegmentChars]] split at codepoint boundaries (never inside a
    * surrogate pair). `segments(t).mkString == t` always. */
  def segments(text: String): Iterator[String] = new Iterator[String] {
    private var i = 0
    override def hasNext: Boolean = i < text.length
    override def next(): String = {
      val start = i
      i += 1 // consume the (possible) leading space
      while (i < text.length && text.charAt(i) != ' ' &&
        i - start < MaxSegmentChars) i += 1
      // never split a surrogate pair: back off one char if the boundary
      // would separate a high surrogate from its low half
      if (i < text.length && i - start == MaxSegmentChars &&
        Character.isHighSurrogate(text.charAt(i - 1)) &&
        Character.isLowSurrogate(text.charAt(i))) i -= 1
      text.substring(start, i)
    }
  }

  /** Train `numMerges` merges from a segment-TYPE frequency table.
    * Deterministic: the winning pair maximizes (count, then smallest
    * left id, then smallest right id) — ties cannot depend on hash-map
    * iteration order. Stops early when no pair reaches `minPairCount`. */
  def train(typeCounts: Seq[(Array[Byte], Long)], numMerges: Int,
            minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(minPairCount >= 1, "minPairCount must be >= 1")
    val words: Array[Array[Int]] = typeCounts.map { case (b, _) =>
      val ids = new Array[Int](b.length)
      var i = 0
      while (i < b.length) { ids(i) = b(i) & 0xff; i += 1 }
      ids
    }.toArray
    val freq: Array[Long] = typeCounts.map(_._2).toArray

    val pairCount = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    // pair -> word indices containing it (occurrence index: a merge
    // rewrites only these words). Entries are never removed, so a set may
    // hold STALE indices (word since rewritten, pair gone) — the rewrite
    // pass is a no-op for those; memory stays proportional to live
    // occurrences, not to the max word index (a BitSet here would
    // allocate up to the highest index per pair).
    val pairWords = new java.util.HashMap[java.lang.Long, java.util.HashSet[Integer]]()

    def addPairs(w: Int, sign: Long): Unit = {
      val ids = words(w)
      var i = 0
      while (i < ids.length - 1) {
        val k = pairKey(ids(i), ids(i + 1))
        val c = pairCount.get(k)
        val nc = (if (c == null) 0L else c.longValue()) + sign * freq(w)
        if (nc == 0L) pairCount.remove(k) else pairCount.put(k, nc)
        if (sign > 0) {
          var bs = pairWords.get(k)
          if (bs == null) { bs = new java.util.HashSet[Integer](); pairWords.put(k, bs) }
          bs.add(w)
        }
        i += 1
      }
    }
    var w = 0
    while (w < words.length) { addPairs(w, 1L); w += 1 }

    val merges = mutable.ArrayBuilder.make[(Int, Int)]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      // deterministic argmax over the live pair table
      var bestK = 0L; var bestC = 0L; var found = false
      val it = pairCount.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey.longValue(); val c = e.getValue.longValue()
        val better = c > bestC || (c == bestC && found &&
          ((k >>> 32) < (bestK >>> 32) ||
            ((k >>> 32) == (bestK >>> 32) && (k & 0xffffffffL) < (bestK & 0xffffffffL))))
        if (!found || better) { bestK = k; bestC = c; found = true }
      }
      if (!found || bestC < minPairCount) done = true
      else {
        val l = (bestK >>> 32).toInt
        val r = (bestK & 0xffffffffL).toInt
        val newId = 256 + m
        merges += ((l, r))
        // snapshot: addPairs(+1) during the rewrite may insert into OTHER
        // pair sets but never re-inserts (l, r) into a rewritten word
        val affected = pairWords.remove(bestK).toArray(Array.empty[Integer])
        var ai = 0
        while (ai < affected.length) {
          val wi = affected(ai).intValue()
          // full remove/rewrite/re-add of just this word: O(len), and
          // only words (once) CONTAINING the pair are touched
          addPairs(wi, -1L)
          val ids = words(wi)
          val out = new Array[Int](ids.length)
          var o = 0; var i = 0
          while (i < ids.length) {
            if (i < ids.length - 1 && ids(i) == l && ids(i + 1) == r) {
              out(o) = newId; o += 1; i += 2
            } else { out(o) = ids(i); o += 1; i += 1 }
          }
          words(wi) = java.util.Arrays.copyOf(out, o)
          addPairs(wi, 1L)
          ai += 1
        }
        m += 1
      }
    }
    BpeModel(merges.result())
  }
}
