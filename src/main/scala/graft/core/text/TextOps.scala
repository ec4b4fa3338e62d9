package graft.core.text

import graft.core.hash.XXH3

/**
 * Pure-JVM text-analysis primitives for the training-data pipeline
 * (tokenize, SimHash, winnowing fingerprint, n-gram language id, quality
 * stats). Static facade style so Catalyst codegen can call them directly.
 */
object TextOps {

  /** Whitespace tokenization (the oracle-friendly definition: split on
    * single spaces, like SQL string_split(text, ' ')). */
  def tokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty else text.split(" ", -1)

  /** BPE-ish token-count heuristic: words + digit runs + punctuation
    * clusters counted separately (a cheap stand-in for a real tokenizer's
    * piece count; deterministic). */
  def tokenCountBpeish(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    var count = 0
    var i = 0
    val n = text.length
    var cls = -1 // 0 letter, 1 digit, 2 punct, 3 space
    while (i < n) {
      val c = text.charAt(i)
      val k = if (Character.isLetter(c)) 0 else if (Character.isDigit(c)) 1
              else if (Character.isWhitespace(c)) 3 else 2
      if (k != 3 && k != cls) count += 1
      // long word pieces: split letters every 6 chars (sub-word pieces)
      else if (k == 0 && k == cls && runLen(text, i) % 6 == 0) count += 1
      cls = k
      i += 1
    }
    count
  }

  @inline private def runLen(s: String, upto: Int): Int = {
    var j = upto - 1
    var len = 1
    while (j >= 0 && Character.isLetter(s.charAt(j))) { len += 1; j -= 1 }
    len
  }

  /** 64-bit SimHash over whitespace tokens (Charikar 2002): per token, its
    * XXH3 hash votes +1/-1 on each bit; the sign vector is the fingerprint.
    * Near-duplicate texts differ in few bits (small Hamming distance). */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    val ts = tokens(text)
    var t = 0
    while (t < ts.length) {
      val h = XXH3.hashString(ts(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /**
   * Rolling-hash document fingerprint: Rabin–Karp style polynomial hash over
   * the UTF-8 bytes (base = FNV-ish odd multiplier, mod 2^64), finalized
   * with an avalanche mix. Identity semantics: equal texts always produce
   * equal fingerprints; distinct texts collide with ~2^-64 probability —
   * the cheap first pass of exact dedup.
   */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = h * 0x100000001b3L + (bytes(i) & 0xffL)
      i += 1
    }
    // avalanche (splitmix64 finalizer)
    h ^= bytes.length.toLong
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Winnowing-style near-dup blocking key (Schleimer, Wilkerson & Aiken
    * 2003, simplified): min XXH3 over character 8-grams — shared by most
    * near-identical texts, used as a coarse prefilter. */
  def winnowMin64(text: String): Long = {
    if (text == null) return 0L
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val k = 8
    if (bytes.length <= k) return XXH3.hash(bytes)
    var min = Long.MaxValue
    var i = 0
    while (i + k <= bytes.length) {
      val h = XXH3.hash(bytes, i, k)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /**
   * Full winnowing fingerprint set (Schleimer et al. 2003): hash every
   * char k-gram, slide a window of `w` hashes, keep each window's minimum
   * (rightmost minimum on ties — the winnowing rule that bounds density).
   * GUARANTEE: any substring match of length >= w + k - 1 chars shares at
   * least one fingerprint — the local plagiarism/quotation detector the
   * min-only [[winnowMin64]] blocker cannot provide. Returns the distinct
   * fingerprints sorted ascending.
   */
  def winnow(text: String, k: Int = 8, w: Int = 4): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length <= k) return Array(XXH3.hash(bytes))
    val nh = bytes.length - k + 1
    val hs = new Array[Long](nh)
    var i = 0
    while (i < nh) { hs(i) = XXH3.hash(bytes, i, k); i += 1 }
    if (nh <= w) {
      var min = hs(0); i = 1
      while (i < nh) { if (hs(i) <= min) min = hs(i); i += 1 }
      return Array(min)
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    var minIdx = -1
    var j = 0
    while (j + w <= nh) {
      if (minIdx < j) { // previous minimum slid out: rescan the window
        minIdx = j
        var m = j + 1
        while (m < j + w) { if (hs(m) <= hs(minIdx)) minIdx = m; m += 1 }
        sel.add(hs(minIdx))
      } else if (hs(j + w - 1) <= hs(minIdx)) { // new right edge wins ties
        minIdx = j + w - 1
        sel.add(hs(minIdx))
      }
      j += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  // ----- language id: tiny trigram profiles for {en, de, sv, fr} -----
  // Profiles are hand-picked high-frequency function-word trigrams per
  // language (public linguistic knowledge, Cavnar & Trenkle style n-gram
  // matching). Returns the best-scoring language or "und" below threshold.

  private val Profiles: Array[(String, Array[String])] = Array(
    "en" -> Array(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing",
      "ng ", " to", "to ", "ion", " in", "in ", "ed ", " is", "is ", "at ", "ent"),
    "de" -> Array(" de", "der", "er ", "ie ", " di", "die", "und", " un", "nd ",
      "en ", "ein", " ei", "ich", "ch ", "sch", "ung", " ge", "cht", "das", " da"),
    "sv" -> Array(" oc", "och", "ch ", " at", "att", "tt ", " so", "som", "om ",
      "för", " fö", "en ", "ar ", " är", "är ", "det", " de", "na ", "ing", " ha"),
    "fr" -> Array(" de", "de ", " le", "le ", "es ", " la", "la ", "ent", " et",
      "et ", "que", " qu", "ue ", "les", "ion", " pa", "par", "ait", " un", "re "))

  def langId(text: String): String = {
    if (text == null || text.length < 6) return "und"
    val t = " " + text.toLowerCase(java.util.Locale.ROOT).take(4000) + " "
    var best = "und"
    var bestScore = 0
    var p = 0
    while (p < Profiles.length) {
      val (lang, grams) = Profiles(p)
      var score = 0
      var g = 0
      while (g < grams.length) {
        var idx = t.indexOf(grams(g))
        while (idx >= 0) { score += 1; idx = t.indexOf(grams(g), idx + 1) }
        g += 1
      }
      if (score > bestScore) { bestScore = score; best = lang }
      p += 1
    }
    // demand minimal evidence density: ~1 hit per 40 chars
    if (bestScore * 40 < t.length) "und" else best
  }

  /** Quality heuristics: fraction of alphabetic chars, fraction of
    * punctuation, mean token length — the standard webtext quality inputs. */
  /** Gopher-style quality signals (Rae et al. 2021 §A1.1; also the C4
    * heuristics): repetition and shape statistics over whitespace tokens.
    * Definitions chosen to be SQL-reproducible for the oracle gate. */

  /** English stopword set used by [[stopwordRatio]] — a small, fixed list
    * (the Gopher rule only needs "contains common English function words"
    * semantics, not a full list). */
  final val Stopwords: Set[String] =
    Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "that", "with", "for")

  /** Fraction of non-empty tokens that are stopwords (0 for empty text). */
  def stopwordRatio(text: String): Double = {
    val ts = tokens(text)
    var n = 0; var hits = 0
    var i = 0
    while (i < ts.length) {
      if (ts(i).nonEmpty) {
        n += 1
        if (Stopwords.contains(ts(i))) hits += 1
      }
      i += 1
    }
    if (n == 0) 0.0 else hits.toDouble / n
  }

  /** Mean length of non-empty tokens (0 for empty text). */
  def meanWordLen(text: String): Double = {
    val ts = tokens(text)
    var n = 0; var chars = 0L
    var i = 0
    while (i < ts.length) {
      if (ts(i).nonEmpty) { n += 1; chars += ts(i).length }
      i += 1
    }
    if (n == 0) 0.0 else chars.toDouble / n
  }

  /** Shannon entropy (bits/char) of the character distribution — the
    * gibberish/low-diversity proxy used by crawl-quality filters (keyboard
    * mash and single-char spam score near 0; natural language sits around
    * 4-4.5 bits for English). Characters are Unicode CODE POINTS (so
    * non-BMP chars count once, matching SQL character semantics); 0 for
    * empty text. Allocation-light and deterministic: one primitive
    * codepoint array, sorted, run-length counted — terms sum in sorted
    * codepoint order. */
  def charEntropy(text: String): Double = {
    if (text.isEmpty) return 0.0
    val cps = text.codePoints().toArray
    java.util.Arrays.sort(cps)
    val n = cps.length
    var h = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val p = (j - i).toDouble / n
      h -= p * (math.log(p) / math.log(2.0))
      i = j
    }
    h
  }

  /** Fraction of lines that are duplicates of an earlier line — the Gopher
    * "duplicate line fraction" repetition signal (Rae et al. 2021,
    * Table A1). Lines split on '\n'; empty lines count. */

  /** Occurrences of `symbol` (non-overlapping, left-to-right) per non-empty
    * word — the Gopher "symbol-to-word ratio" signal for "#" and the
    * ellipsis. 0 when there are no words. */
  def symbolWordRatio(text: String, symbol: String): Double = {
    require(symbol != null && symbol.nonEmpty,
      "symbolWordRatio needs a non-empty symbol (empty would loop forever)")
    val words = tokens(text).count(_.nonEmpty)
    if (words == 0) return 0.0
    var n = 0
    var i = text.indexOf(symbol)
    while (i >= 0) { n += 1; i = text.indexOf(symbol, i + symbol.length) }
    n.toDouble / words
  }

  /** Fraction of lines whose first non-space char is a bullet (-, *, •) —
    * Gopher drops docs where > 90% of lines are bullets. */
  def bulletLineRatio(text: String): Double = {
    val lines = text.split("\n", -1)
    if (lines.isEmpty) return 0.0
    val b = lines.count { l =>
      val t = l.dropWhile(_.isWhitespace)
      t.nonEmpty && (t.head == '-' || t.head == '*' || t.head == '•')
    }
    b.toDouble / lines.length
  }

  /** Fraction of lines ending (ignoring trailing spaces) with "..." or the
    * unicode ellipsis — Gopher drops docs where > 30% of lines do. */
  def ellipsisLineRatio(text: String): Double = {
    val lines = text.split("\n", -1)
    if (lines.isEmpty) return 0.0
    val e = lines.count { l =>
      val t = l.reverse.dropWhile(_.isWhitespace).reverse
      t.endsWith("...") || t.endsWith("…")
    }
    e.toDouble / lines.length
  }

  /** Number of non-empty words (single-space tokenization) — the codegen'd
    * word counter (the builtin size(filter(split(...))) composition is a
    * CodegenFallback higher-order function). */
  def wordCount(text: String): Int = tokens(text).count(_.nonEmpty)

  /** Fraction of non-empty words containing at least one ASCII letter —
    * Gopher requires >= 80%. 0 when there are no words. */
  def alphaWordRatio(text: String): Double = {
    val ws = tokens(text).filter(_.nonEmpty)
    if (ws.isEmpty) return 0.0
    ws.count(_.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
      .toDouble / ws.length
  }

  /** Gopher's required-stopword list. */
  val GopherStopwords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  /** How many DISTINCT words of [[GopherStopwords]] appear as whole tokens
    * — Gopher requires at least 2. */
  def stopwordHits(text: String): Int = {
    val ts = tokens(text)
    var hits = 0
    var i = 0
    while (i < GopherStopwords.length) {
      if (ts.contains(GopherStopwords(i))) hits += 1
      i += 1
    }
    hits
  }

  /** Overlapping token-window chunks for context-length preparation: token
    * starts advance by stride = maxTokens - overlap; every chunk except
    * possibly the last holds exactly maxTokens tokens, consecutive chunks
    * share `overlap` tokens, and chunking stops once a chunk reaches the
    * final token (no fully-contained trailing windows). Tokens are the
    * single-space split with empties dropped; chunks re-join with single
    * spaces. Empty/whitespace text yields no chunks. */
  def chunks(text: String, maxTokens: Int, overlap: Int): Array[String] = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens, "overlap must be in [0, maxTokens)")
    val ts = tokens(text).filter(_.nonEmpty)
    if (ts.isEmpty) return Array.empty
    if (ts.length <= maxTokens) return Array(ts.mkString(" "))
    val stride = maxTokens - overlap
    val n = 1 + math.ceil((ts.length - maxTokens).toDouble / stride).toInt
    Array.tabulate(n)(i => ts.slice(i * stride, i * stride + maxTokens).mkString(" "))
  }

  /** Fraction of token characters inside the MOST frequent word n-gram
    * (count * gram-char-length / total token chars, CAPPED at 1.0 —
    * overlapping occurrences of periodic text like "a a a a" would
    * otherwise count characters twice and push a "fraction" past 1) — the
    * Gopher "fraction of characters in the most frequent {2,3,4}-gram"
    * repetition signal (Rae et al. 2021). Tokens are the single-space
    * split with empties dropped; character totals exclude spaces on both
    * sides. Deterministic tie-break: highest count, then longest gram,
    * then lexicographically smallest. 0 when the text has fewer than n
    * tokens or no characters. */
  def topNgramCharRatio(text: String, n: Int): Double = {
    require(n >= 1, "n must be >= 1")
    val ts = tokens(text).filter(_.nonEmpty)
    var total = 0L
    ts.foreach(t => total += t.length)
    if (total == 0 || ts.length < n) return 0.0
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= ts.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ts(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var bestCnt = 0
    var bestLen = -1L
    var bestGram: String = null
    counts.forEach { (g, c) =>
      val charLen = (g.length - (n - 1)).toLong // joining spaces excluded
      if (c > bestCnt || (c == bestCnt && (charLen > bestLen ||
          (charLen == bestLen && g.compareTo(bestGram) < 0)))) {
        bestCnt = c; bestLen = charLen; bestGram = g
      }
    }
    math.min(1.0, bestCnt.toDouble * bestLen / total)
  }

  /** Fraction of token characters covered by any word n-gram occurring at
    * least twice (each token position counted ONCE even under overlapping
    * occurrences) — the Gopher "fraction of characters in duplicated
    * {5..10}-grams" repetition signal (Rae et al. 2021). Same
    * tokenization/char conventions as [[topNgramCharRatio]]. */
  def dupNgramCharRatio(text: String, n: Int): Double = {
    require(n >= 1, "n must be >= 1")
    val ts = tokens(text).filter(_.nonEmpty)
    var total = 0L
    ts.foreach(t => total += t.length)
    if (total == 0 || ts.length < n) return 0.0
    val counts = new java.util.HashMap[String, Integer]()
    val grams = new Array[String](ts.length - n + 1)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= ts.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(ts(i + j))
        j += 1
      }
      grams(i) = sb.toString
      counts.merge(grams(i), 1, (a, b) => a + b)
      i += 1
    }
    val covered = new Array[Boolean](ts.length)
    i = 0
    while (i < grams.length) {
      if (counts.get(grams(i)) >= 2) {
        var j = 0
        while (j < n) { covered(i + j) = true; j += 1 }
      }
      i += 1
    }
    var dup = 0L
    i = 0
    while (i < ts.length) {
      if (covered(i)) dup += ts(i).length
      i += 1
    }
    dup.toDouble / total
  }

  def dupLineRatio(text: String): Double = {
    val lines = text.split("\n", -1)
    if (lines.isEmpty) return 0.0
    val seen = new java.util.HashSet[String]()
    var dups = 0
    var i = 0
    while (i < lines.length) {
      if (!seen.add(lines(i))) dups += 1
      i += 1
    }
    dups.toDouble / lines.length
  }

  /** Fraction of characters sitting in duplicate lines (occurrences beyond
    * the first) over all line characters — the Gopher "duplicate line
    * character fraction" (Rae et al. 2021). Newlines excluded from both
    * sides; 0 when the text has no line characters at all. */
  def dupLineCharRatio(text: String): Double = {
    val lines = text.split("\n", -1)
    val seen = new java.util.HashSet[String]()
    var total = 0L
    var dup = 0L
    var i = 0
    while (i < lines.length) {
      total += lines(i).length
      if (!seen.add(lines(i))) dup += lines(i).length
      i += 1
    }
    if (total == 0) 0.0 else dup.toDouble / total
  }

  /** Frequency of the most common non-empty token over the token count —
    * the Gopher "fraction of text in the most common word" repetition
    * signal (high values mark degenerate/boilerplate docs). Ties don't
    * matter: only the max count is used. */
  def maxTokenRatio(text: String): Double = {
    val ts = tokens(text)
    if (ts.isEmpty) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    var n = 0
    var i = 0
    while (i < ts.length) {
      if (ts(i).nonEmpty) { n += 1; counts.merge(ts(i), 1, Integer.sum) }
      i += 1
    }
    if (n == 0) return 0.0
    var max = 0
    val it = counts.values().iterator()
    while (it.hasNext) max = math.max(max, it.next())
    max.toDouble / n
  }

  def alphaRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    var a = 0
    var i = 0
    while (i < text.length) { if (Character.isLetter(text.charAt(i))) a += 1; i += 1 }
    a.toDouble / text.length
  }

  def punctRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    var p = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c)) p += 1
      i += 1
    }
    p.toDouble / text.length
  }
}
