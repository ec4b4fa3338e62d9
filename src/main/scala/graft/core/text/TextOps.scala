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

  // ----- language id: script detection + tiny trigram profiles -----
  // Non-Latin scripts resolve FIRST by Unicode-range share (zh/ja/ko via
  // Han/kana/hangul, native-Cyrillic ru, Greek el — scripts are decisive
  // evidence no trigram vote should overrule); Latin-script text then
  // votes over the 10 trigram profiles below.
  // Profiles are hand-picked high-frequency function-word trigrams per
  // language (public linguistic knowledge, Cavnar & Trenkle style n-gram
  // matching): {en, de, sv, fr, es, it, pt, nl, pl, ru-translit}. Close
  // pairs (es/pt, de/nl, es/it) are separated by including each language's
  // DISTINCTIVE function-word grams (pt "ção/ão/uma", es "el /ión/ado",
  // nl "het/ijn/oor" vs de "ich/sch/ung", pl digraph clusters "prz/rze/ych",
  // translit-ru case endings "ogo/aya/stv") alongside the shared mass.
  // Returns the best-scoring language or "und" below the evidence
  // threshold; ties break toward the earlier profile, so sentences with no
  // distinctive evidence stay on the bigger-mass languages.

  private val Profiles: Array[(String, Array[String])] = Array(
    "en" -> Array(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing",
      "ng ", " to", "to ", "ion", " in", "in ", "ed ", " is", "is ", "at ", "ent"),
    "de" -> Array(" de", "der", "er ", "ie ", " di", "die", "und", " un", "nd ",
      "en ", "ein", " ei", "ich", "ch ", "sch", "ung", " ge", "cht", "das", " da"),
    "sv" -> Array(" oc", "och", "ch ", " at", "att", "tt ", " so", "som", "om ",
      "för", " fö", "en ", "ar ", " är", "är ", "det", " de", "na ", "ing", " ha"),
    "fr" -> Array(" de", "de ", " le", "le ", "es ", " la", "la ", "ent", " et",
      "et ", "que", " qu", "ue ", "les", "ion", " pa", "par", "ait", " un", "re "),
    "es" -> Array(" de", "de ", " la", "la ", " el", "el ", "que", " qu", "ue ",
      "os ", "ión", "ció", " en", "en ", " es", "es ", "ado", "una", " co", "ar "),
    "it" -> Array(" di", "di ", "che", " ch", "he ", " il", "il ", "lla", " co",
      "con", "per", " pe", "re ", "zio", "ion", "to ", "la ", "del", " de", "gli"),
    "pt" -> Array(" de", "de ", " da", "da ", " do", "do ", "ção", "ão ", " nã",
      "não", "em ", " em", "um ", " um", "uma", "par", "ara", "os ", "que", " qu",
      "ue ", "com", " co"),
    "nl" -> Array(" de", "de ", "een", " ee", "het", " he", "et ", "van", " va",
      "an ", "ijn", " zi", "en ", "aar", "oor", "iet", "nie", "ond", "ij ", "dat"),
    "pl" -> Array("nie", " ni", "ie ", " po", "na ", " na", "ch ", "ego", "prz",
      "rze", "ych", "ej ", " je", "się", " si", "ię ", "owa", "ani", "dzi", " wy"),
    "ru" -> Array(" ne", "ne ", " na", "na ", " po", "ogo", "ego", "ost", "stv",
      "aya", "oro", "eni", " pr", "pro", "pri", "kot", "cht", "hto", " za", "to ",
      "ya ", "yet"))

  /** Language id alone — [[langIdConf]] without the margin. */
  def langId(text: String): String = langIdConf(text)._1

  /**
   * Language id WITH a confidence margin — what a real pipeline thresholds
   * on before trusting the label. Semantics of the margin:
   *  - script pass (decisive): the deciding script's share of counted
   *    letters, in (0.3, 1];
   *  - trigram pass: the relative gap (best − secondBest) / best over the
   *    profile scores, in [0, 1] — close pairs (es/pt, de/nl) land near 0,
   *    clearly monolingual prose near 1;
   *  - "und" (no/insufficient evidence, gibberish, mixed-script soup):
   *    margin 0.0.
   * `langIdConf(t)._1 == langId(t)` by construction (single code path).
   */
  def langIdConf(text: String): (String, Double) = {
    if (text == null || text.length < 6) return ("und", 0.0)
    val t = " " + text.toLowerCase(java.util.Locale.ROOT).take(4000) + " "
    // ---- script pass first: non-Latin scripts are DECISIVE, trigram
    // profiles never see them. kana => ja; hangul => ko; Han without kana
    // => zh (Japanese prose always mixes kana in); native-Cyrillic => ru
    // (the trigram profile covers transliterated ru); Greek => el. A
    // >=30% script share over counted letters calls it; mixed/boilerplate
    // pages below the bar fall through to the trigram vote.
    var han = 0; var kana = 0; var hangul = 0; var cyr = 0; var grk = 0
    var ara = 0; var heb = 0; var tha = 0; var dev = 0
    var letters = 0
    var ci = 1
    while (ci < t.length - 1) {
      val c = t.charAt(ci)
      if (Character.isLetter(c)) {
        letters += 1
        if ((c >= 0x4E00 && c <= 0x9FFF) || (c >= 0x3400 && c <= 0x4DBF)) han += 1
        else if (c >= 0x3040 && c <= 0x30FF) kana += 1
        else if ((c >= 0xAC00 && c <= 0xD7AF) || (c >= 0x1100 && c <= 0x11FF)) hangul += 1
        else if (c >= 0x0400 && c <= 0x04FF) cyr += 1
        else if (c >= 0x0370 && c <= 0x03FF) grk += 1
        else if ((c >= 0x0600 && c <= 0x06FF) || (c >= 0x0750 && c <= 0x077F)) ara += 1
        else if (c >= 0x0590 && c <= 0x05FF) heb += 1
        else if (c >= 0x0E00 && c <= 0x0E7F) tha += 1
        else if (c >= 0x0900 && c <= 0x097F) dev += 1
      }
      ci += 1
    }
    if (letters > 0) {
      def share(n: Int): Double = n.toDouble / letters
      // ja needs BOTH a CJK-dominant page and a real kana share (>= 5%):
      // Japanese prose is kana-heavy, while a Chinese page with one
      // stylistic kana (brand names like 优の良品) must stay zh
      if ((han + kana) * 10 >= letters * 3 && kana * 20 >= letters)
        return ("ja", share(han + kana))
      if (hangul * 10 >= letters * 3) return ("ko", share(hangul))
      if (han * 10 >= letters * 3) return ("zh", share(han))
      if (cyr * 10 >= letters * 3) return ("ru", share(cyr))
      if (grk * 10 >= letters * 3) return ("el", share(grk))
      if (ara * 10 >= letters * 3) return ("ar", share(ara))
      if (heb * 10 >= letters * 3) return ("he", share(heb))
      if (tha * 10 >= letters * 3) return ("th", share(tha))
      if (dev * 10 >= letters * 3) return ("hi", share(dev))
    }
    var best = "und"
    var bestScore = 0
    var secondScore = 0
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
      if (score > bestScore) { secondScore = bestScore; bestScore = score; best = lang }
      else if (score > secondScore) secondScore = score
      p += 1
    }
    // demand minimal evidence density: ~1 hit per 40 chars
    if (bestScore * 40 < t.length) ("und", 0.0)
    else (best, (bestScore - secondScore).toDouble / bestScore)
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

  /** All Gopher signal values computed by [[gopherStats]] in one pass.
    * `topNgram` / `dupNgram` align positionally with the `topNs` / `dupNs`
    * arguments. */
  final case class GopherStats(
      nWords: Long, meanWordLen: Double, hashRatio: Double, ellipsisRatio: Double,
      bulletLineRatio: Double, ellipsisLineRatio: Double, alphaWordRatio: Double,
      stopwordHits: Int, dupLineRatio: Double, dupLineCharRatio: Double,
      topNgram: Array[Double], dupNgram: Array[Double])

  /** Test/diagnostic hook: number of [[gopherStats]] invocations in this
    * JVM (proves the plan evaluates the fused kernel once per row, not once
    * per extracted struct field). */
  val gopherStatsCalls = new java.util.concurrent.atomic.LongAdder

  /** Order-sensitive 64-bit hash combine for the incremental gram-hash
    * chain (boost-style xor + splitmix64 avalanche). Only self-consistency
    * matters — gram identity never leaves one invocation. */
  @inline private def combineHash(prev: Long, next: Long): Long = {
    var h = prev ^ (next * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L)
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /**
   * ALL Gopher quality signals (Rae et al. 2021 Table A1) in a single pass:
   * one newline/tab normalization, one tokenization, one token-hash array,
   * then every word n-gram statistic from an INCREMENTAL hash chain
   * (gram-hash for n extends the stored gram-hash for n-1 by one token
   * hash) with sort-based counting — where the per-signal kernels
   * re-tokenize and rebuild string-keyed maps ~15 times per row. Produces
   * BIT-IDENTICAL values to the individual kernels ([[wordCount]],
   * [[meanWordLen]], [[symbolWordRatio]], [[bulletLineRatio]],
   * [[ellipsisLineRatio]], [[alphaWordRatio]], [[stopwordHits]],
   * [[dupLineRatio]], [[dupLineCharRatio]], [[topNgramCharRatio]],
   * [[dupNgramCharRatio]]) run over the same word/line inputs, with one
   * caveat: n-gram identity here is a chained 64-bit hash rather than the
   * gram string, so two DISTINCT grams of a document colliding in 64 bits
   * (P ~ 2^-64 per pair) could merge counts — the engine's standard
   * content-address assumption.
   *
   * Word-level signals run on text with [\n\r\t] replaced by spaces (the
   * word tokenizer would otherwise glue "a\nb" into one token); line-level
   * signals run on the raw text. `topNs`/`dupNs` must be ascending and
   * >= 1 each.
   */
  def gopherStats(text: String, topNs: Array[Int], dupNs: Array[Int]): GopherStats = {
    gopherStatsCalls.increment()
    gopherCompute(text, topNs, dupNs, null)
  }

  /** ONE kernel for both entry points — [[gopherStats]] (check = null:
    * compute every signal) and [[gopherKeep]] (check != null: verify each
    * stage's thresholds as soon as its values exist and return null at the
    * FIRST violation, so a rejected document never reaches the n-gram
    * engine). A single body keeps the two contracts from drifting: the
    * keep decision is, by construction, the threshold rule over exactly
    * the values the struct kernel reports. */
  private def gopherCompute(text: String, topNs: Array[Int], dupNs: Array[Int],
                            check: GopherParams): GopherStats = {
    // --- word text: [\n\r\t] -> ' ' (only materialize when needed) ---
    var needsWt = false
    var ci = 0
    while (ci < text.length && !needsWt) {
      val c = text.charAt(ci)
      if (c == '\n' || c == '\r' || c == '\t') needsWt = true
      ci += 1
    }
    val wt = if (!needsWt) text else {
      val a = text.toCharArray
      var i = 0
      while (i < a.length) {
        val c = a(i)
        if (c == '\n' || c == '\r' || c == '\t') a(i) = ' '
        i += 1
      }
      new String(a)
    }

    // --- one tokenization; word stats in the same pass ---
    val ts = if (wt.isEmpty) Array.empty[String] else wt.split(" ", -1)
    val ws = new Array[String](ts.length)
    var nW = 0
    var charTotal = 0L
    var alphaWords = 0
    var stopMask = 0
    var i = 0
    while (i < ts.length) {
      val t = ts(i)
      if (t.nonEmpty) {
        ws(nW) = t
        nW += 1
        charTotal += t.length
        var hasAlpha = false
        var j = 0
        while (j < t.length && !hasAlpha) {
          val c = t.charAt(j)
          hasAlpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
          j += 1
        }
        if (hasAlpha) alphaWords += 1
      }
      // stopword membership over ALL tokens (empties can't match anyway)
      var s = 0
      while (s < GopherStopwords.length) {
        if ((stopMask & (1 << s)) == 0 && t == GopherStopwords(s)) stopMask |= 1 << s
        s += 1
      }
      i += 1
    }

    // stage 1 thresholds (keep mode): word-shape stats from one pass
    val meanLen = if (nW == 0) 0.0 else charTotal.toDouble / nW
    val alphaWordRatioV = if (nW == 0) 0.0 else alphaWords.toDouble / nW
    val stopHits = Integer.bitCount(stopMask)
    if (check != null) {
      if (nW < check.minWords || nW > check.maxWords) return null
      if (!(meanLen >= check.minMeanWordLen && meanLen <= check.maxMeanWordLen)) return null
      if (!(alphaWordRatioV >= check.minAlphaWordRatio)) return null
      if (stopHits < check.minStopwordHits) return null
    }

    // --- symbol counts over the word text, one char scan ---
    // "..." is counted non-overlapping left-to-right (indexOf semantics)
    var cntHash = 0
    var cntDots = 0
    var cntUniEll = 0
    i = 0
    while (i < wt.length) {
      val c = wt.charAt(i)
      if (c == '#') { cntHash += 1; i += 1 }
      else if (c == '…') { cntUniEll += 1; i += 1 }
      else if (c == '.' && i + 2 < wt.length &&
               wt.charAt(i + 1) == '.' && wt.charAt(i + 2) == '.') {
        cntDots += 1; i += 3
      } else i += 1
    }
    // two separate ratios summed — the exact float arithmetic of
    // symbol_word_ratio(wt, "...") + symbol_word_ratio(wt, "…")
    val hashRatio = if (nW == 0) 0.0 else cntHash.toDouble / nW
    val ellRatio = if (nW == 0) 0.0
      else cntDots.toDouble / nW + cntUniEll.toDouble / nW
    if (check != null) {
      if (!(hashRatio <= check.maxHashRatio)) return null
      if (!(ellRatio <= check.maxEllipsisRatio)) return null
    }

    // --- line stats over the RAW text, one line pass ---
    val lines = text.split("\n", -1)
    var bulletLines = 0
    var ellLines = 0
    var dupLines = 0
    var lineChars = 0L
    var dupLineChars = 0L
    val seen = new java.util.HashSet[String]()
    i = 0
    while (i < lines.length) {
      val l = lines(i)
      lineChars += l.length
      if (!seen.add(l)) { dupLines += 1; dupLineChars += l.length }
      var a = 0
      while (a < l.length && Character.isWhitespace(l.charAt(a))) a += 1
      if (a < l.length) {
        val c = l.charAt(a)
        if (c == '-' || c == '*' || c == '•') bulletLines += 1
      }
      var z = l.length - 1
      while (z >= 0 && Character.isWhitespace(l.charAt(z))) z -= 1
      if (z >= 0 && (l.charAt(z) == '…' ||
          (z >= 2 && l.charAt(z) == '.' && l.charAt(z - 1) == '.' && l.charAt(z - 2) == '.')))
        ellLines += 1
      i += 1
    }
    val nLines = lines.length // split("\n", -1) never returns empty
    val bulletRatio = if (nLines == 0) 0.0 else bulletLines.toDouble / nLines
    val ellLineRatio = if (nLines == 0) 0.0 else ellLines.toDouble / nLines
    val dupLineRatioV = dupLines.toDouble / nLines
    val dupLineCharRatioV = if (lineChars == 0) 0.0 else dupLineChars.toDouble / lineChars
    if (check != null) {
      if (!(bulletRatio <= check.maxBulletLineRatio)) return null
      if (!(ellLineRatio <= check.maxEllipsisLineRatio)) return null
      if (!(dupLineRatioV <= check.maxDupLineRatio)) return null
      if (!(dupLineCharRatioV <= check.maxDupLineCharRatio)) return null
    }

    // --- n-gram engine: token hashes once, incremental gram-hash chain ---
    val topOut = new Array[Double](topNs.length)
    val dupOut = new Array[Double](dupNs.length)
    val maxN = (topNs.lastOption.getOrElse(1)).max(dupNs.lastOption.getOrElse(1))
    if ((topNs.nonEmpty || dupNs.nonEmpty) && nW > 0 && charTotal > 0) {
      val th = new Array[Long](nW)
      val pre = new Array[Long](nW + 1)
      i = 0
      while (i < nW) {
        th(i) = XXH3.hashString(ws(i))
        pre(i + 1) = pre(i) + ws(i).length
        i += 1
      }
      val g = th.clone() // gram hashes for current n (starts at n=1)
      val sbuf = new Array[Long](nW)
      val covered = new Array[Boolean](nW)

      def countOf(m: Int, h: Long): Int = {
        // run length of h in sbuf[0, m): two binary searches
        var lo = 0; var hi = m
        while (lo < hi) { val mid = (lo + hi) >>> 1
          if (sbuf(mid) < h) lo = mid + 1 else hi = mid }
        val first = lo
        hi = m
        while (lo < hi) { val mid = (lo + hi) >>> 1
          if (sbuf(mid) <= h) lo = mid + 1 else hi = mid }
        lo - first
      }

      var n = 1 // g already holds the n=1 gram (token) hashes
      var ti = 0
      var di = 0
      while (n <= maxN) {
        val m = nW - n + 1
        if (n >= 2 && m > 0) {
          i = 0
          while (i < m) { g(i) = combineHash(g(i), th(i + n - 1)); i += 1 }
        }
        val isTop = ti < topNs.length && topNs(ti) == n
        val isDup = di < dupNs.length && dupNs(di) == n
        if ((isTop || isDup) && m > 0) {
          System.arraycopy(g, 0, sbuf, 0, m)
          java.util.Arrays.sort(sbuf, 0, m)
        }
        if (isTop) {
          if (m > 0) {
            var maxCount = 0
            i = 0
            while (i < m) { // run scan over the sorted copy
              var j = i + 1
              while (j < m && sbuf(j) == sbuf(i)) j += 1
              if (j - i > maxCount) maxCount = j - i
              i = j
            }
            // winning gram = count desc, char length desc (the string
            // tie-break of topNgramCharRatio only orders grams of EQUAL
            // char length, so it can never change count*len/total)
            var bestLen = -1L
            i = 0
            while (i < m) {
              if (countOf(m, g(i)) == maxCount) {
                val len = pre(i + n) - pre(i)
                if (len > bestLen) bestLen = len
              }
              i += 1
            }
            topOut(ti) = math.min(1.0, maxCount.toDouble * bestLen / charTotal)
          }
          if (check != null && !(topOut(ti) <= check.topMax(ti))) return null
          ti += 1
        }
        if (isDup) {
          if (m > 0) {
            java.util.Arrays.fill(covered, 0, nW, false)
            i = 0
            while (i < m) {
              if (countOf(m, g(i)) >= 2) {
                var j = i
                while (j < i + n) { covered(j) = true; j += 1 }
              }
              i += 1
            }
            var dup = 0L
            i = 0
            while (i < nW) { if (covered(i)) dup += ws(i).length; i += 1 }
            dupOut(di) = dup.toDouble / charTotal
          }
          if (check != null && !(dupOut(di) <= check.dupMax(di))) return null
          di += 1
        }
        n += 1
      }
    } else if (check != null) {
      // engine skipped (no tokens/chars or no requested sizes): every
      // n-gram signal is 0.0 and must still face its threshold
      var k = 0
      while (k < topNs.length) { if (!(0.0 <= check.topMax(k))) return null; k += 1 }
      k = 0
      while (k < dupNs.length) { if (!(0.0 <= check.dupMax(k))) return null; k += 1 }
    }

    GopherStats(
      nWords = nW.toLong,
      meanWordLen = meanLen,
      hashRatio = hashRatio,
      ellipsisRatio = ellRatio,
      bulletLineRatio = bulletRatio,
      ellipsisLineRatio = ellLineRatio,
      alphaWordRatio = alphaWordRatioV,
      stopwordHits = stopHits,
      dupLineRatio = dupLineRatioV,
      dupLineCharRatio = dupLineCharRatioV,
      topNgram = topOut, dupNgram = dupOut)
  }

  /** Threshold set for [[gopherKeep]] — mirrors the published Gopher rule
    * (Rae et al. 2021 Table A1); `topNs`/`topMax` and `dupNs`/`dupMax`
    * align positionally, ns ascending. */
  final case class GopherParams(
      minWords: Int, maxWords: Int,
      minMeanWordLen: Double, maxMeanWordLen: Double,
      maxHashRatio: Double, maxEllipsisRatio: Double,
      maxBulletLineRatio: Double, maxEllipsisLineRatio: Double,
      minAlphaWordRatio: Double, minStopwordHits: Int,
      maxDupLineRatio: Double, maxDupLineCharRatio: Double,
      topNs: Array[Int], topMax: Array[Double],
      dupNs: Array[Int], dupMax: Array[Double]) {
    // Structural equality over the array fields (case-class default is
    // reference equality on arrays): two GopherKeep/GopherSignals
    // expressions built from separate toParams calls must canonicalize
    // EQUAL or Catalyst subexpression elimination never dedups them.
    override def equals(other: Any): Boolean = other match {
      case o: GopherParams =>
        minWords == o.minWords && maxWords == o.maxWords &&
        minMeanWordLen == o.minMeanWordLen && maxMeanWordLen == o.maxMeanWordLen &&
        maxHashRatio == o.maxHashRatio && maxEllipsisRatio == o.maxEllipsisRatio &&
        maxBulletLineRatio == o.maxBulletLineRatio &&
        maxEllipsisLineRatio == o.maxEllipsisLineRatio &&
        minAlphaWordRatio == o.minAlphaWordRatio &&
        minStopwordHits == o.minStopwordHits &&
        maxDupLineRatio == o.maxDupLineRatio &&
        maxDupLineCharRatio == o.maxDupLineCharRatio &&
        java.util.Arrays.equals(topNs, o.topNs) &&
        java.util.Arrays.equals(topMax, o.topMax) &&
        java.util.Arrays.equals(dupNs, o.dupNs) &&
        java.util.Arrays.equals(dupMax, o.dupMax)
      case _ => false
    }
    override def hashCode(): Int = {
      var h = minWords * 31 + maxWords
      h = h * 31 + java.lang.Double.hashCode(minMeanWordLen)
      h = h * 31 + java.lang.Double.hashCode(minAlphaWordRatio)
      h = h * 31 + minStopwordHits
      h = h * 31 + java.util.Arrays.hashCode(topNs)
      h = h * 31 + java.util.Arrays.hashCode(topMax)
      h = h * 31 + java.util.Arrays.hashCode(dupNs)
      h * 31 + java.util.Arrays.hashCode(dupMax)
    }
  }

  /**
   * The complete Gopher KEEP decision as one short-circuiting kernel:
   * exactly the conjunction of every threshold check over the
   * [[gopherStats]] signal values (bit-identical computations, so the
   * boolean always equals comparing the struct's fields), but staged so a
   * failing document exits at its FIRST violated stage — word-shape stats
   * (one tokenization) first, then the symbol scan, then the line pass,
   * then the n-gram engine in ascending n with a check per n. On a
   * reject-heavy crawl most documents never reach the n-gram stage at all,
   * which a struct-valued expression cannot do (its consumer decides which
   * fields it needs; the kernel computes all of them). This is why
   * `filter(gopher_keep(text))` is the fast path for pure filtering while
   * `gopher_signals` serves the audit projection.
   */
  def gopherKeep(text: String, p: GopherParams): Boolean =
    gopherCompute(text, p.topNs, p.dupNs, p) != null

  /**
   * Rabin–Karp rolling hashes of every k-char window at the given stride:
   * out(i) = avalanche(polyhash(text[i*stride, i*stride + k))). One pass —
   * O(n) total for stride 1 (each window rolls from its predecessor in
   * O(stride)), vs O(n*k) for per-window hashing. The raw polynomial
   * (base FNV-prime, mod 2^64) rolls; the splitmix64 avalanche is applied
   * only at emission so grouped counting doesn't see polynomial
   * clustering. Windows are UTF-16 chars (ASCII/BMP corpora: same as
   * codepoints). Texts shorter than k yield no windows.
   *
   * This is the anchor primitive of substring-repetition dedup (Lee et
   * al. 2021, "Deduplicating Training Data Makes Language Models
   * Better"): any repeated substring of length >= k (+ stride - 1 when
   * striding) contains a repeated window.
   */
  def rollingKgramHashes(text: String, k: Int, stride: Int): Array[Long] = {
    require(k >= 2, "window length k must be >= 2")
    require(stride >= 1, "stride must be >= 1")
    if (text == null || text.length < k) return Array.emptyLongArray
    val n = text.length
    val b = 0x100000001b3L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= b; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * b + text.charAt(i); i += 1 }
    @inline def ava(x0: Long): Long = {
      var x = (x0 ^ (x0 >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val m = (n - k) / stride + 1
    val out = new Array[Long](m)
    out(0) = ava(h)
    var w = 1
    while (w < m) {
      var j = (w - 1) * stride
      val end = j + stride
      while (j < end) {
        h = (h - text.charAt(j) * pow) * b + text.charAt(j + k)
        j += 1
      }
      out(w) = ava(h)
      w += 1
    }
    out
  }

  /** Merge window-start positions into maximal covered spans: each
    * position p covers [p, p+winLen); overlapping or touching covers
    * merge. Returns flattened [start0, end0, start1, end1, ...] (ends
    * exclusive). The input is defensively sorted (a copy) when not already
    * ascending — the result is a property of the SET of windows, and the
    * expression is SQL-exposed where callers owe no ordering. */
  def mergeSpans(positions0: Array[Long], winLen: Int): Array[Long] = {
    if (positions0.isEmpty) return Array.emptyLongArray
    var sorted = true
    var s = 1
    while (s < positions0.length && sorted) {
      sorted = positions0(s - 1) <= positions0(s); s += 1
    }
    val positions =
      if (sorted) positions0
      else { val c = positions0.clone(); java.util.Arrays.sort(c); c }
    val out = new scala.collection.mutable.ArrayBuffer[Long](8)
    var start = positions(0)
    var end = positions(0) + winLen
    var i = 1
    while (i < positions.length) {
      val p = positions(i)
      if (p <= end) { if (p + winLen > end) end = p + winLen }
      else { out += start; out += end; start = p; end = p + winLen }
      i += 1
    }
    out += start; out += end
    out.toArray
  }

  /** Remove [start, end) char ranges from a text (the splice step of
    * span-level dedup). Ranges may arrive unsorted/overlapping (they are
    * sorted and merged here — the result is a property of the covered
    * SET) and are clamped to the text's bounds. */
  def spliceOut(text: String, starts: Array[Long], ends: Array[Long]): String = {
    if (starts.isEmpty) return text
    val n = starts.length
    val idx = Array.range(0, n).sortBy(starts(_))
    val sb = new java.lang.StringBuilder(text.length)
    var cursor = 0
    var k = 0
    while (k < n) {
      val s = math.max(0L, math.min(starts(idx(k)), text.length.toLong)).toInt
      val e = math.max(0L, math.min(ends(idx(k)), text.length.toLong)).toInt
      if (e > s) {
        if (s > cursor) sb.append(text, cursor, s)
        if (e > cursor) cursor = e
      }
      k += 1
    }
    if (cursor < text.length) sb.append(text, cursor, text.length)
    sb.toString
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

  // ----- wordlist (badwords) matching: the C4 blocklist-filter stage -----

  /** Chars stripped from token ends before wordlist comparison (ASCII
    * punctuation; SQL-replayable as a DuckDB trim() char set). */
  private val StripChars: Array[Boolean] = {
    val t = new Array[Boolean](128)
    ".,!?;:'\"()[]{}<>-_/".foreach(c => t(c) = true)
    t
  }

  @inline private def isStrip(c: Char): Boolean = c < 128 && StripChars(c)

  /** Wordlist tokenization: split on WHITESPACE RUNS (newlines and tabs
    * included, empties dropped). The blocklist stage sits behind
    * html_text, whose output joins lines with '\n' — splitting on single
    * spaces like `tokens` would fuse every line-initial word with its
    * predecessor and the list would never match it. */
  def wsTokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.split("\\s+", -1).filter(_.nonEmpty)

  /** Token normalized for wordlist comparison: ends stripped of ASCII
    * punctuation, then lowercased. */
  def strippedToken(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isStrip(s.charAt(a))) a += 1
    while (b > a && isStrip(s.charAt(b - 1))) b -= 1
    (if (a == 0 && b == s.length) s else s.substring(a, b))
      .toLowerCase(java.util.Locale.ROOT)
  }

  /** Normalized wordlist: terms tokenized and normalized with the SAME
    * rule as the text side; single-token terms in a hash set, multi-token
    * terms as token runs. Terms that normalize to nothing are dropped.
    * Serializable so codegen can embed the built list per executor. */
  final class TermList(terms: Seq[String]) extends Serializable {
    val singles = new java.util.HashSet[String]()
    val phrases: Array[Array[String]] = {
      val ph = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
      terms.foreach { t =>
        val toks = wsTokens(t).iterator.map(strippedToken).filter(_.nonEmpty).toArray
        if (toks.length == 1) singles.add(toks(0))
        else if (toks.length > 1) ph += toks
      }
      ph.toArray
    }
  }

  /** Wordlist occurrence count over the text's normalized tokens:
    * single-term hits by set membership, phrase hits counted at every
    * start position (overlaps allowed). The C4 badwords rule is
    * `termHits(text, list) == 0`. */
  def termHits(text: String, tl: TermList): Int = {
    val raw = wsTokens(text)
    if (raw.isEmpty) return 0
    val ts = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) { ts(i) = strippedToken(raw(i)); i += 1 }
    var hits = 0
    i = 0
    while (i < ts.length) {
      if (ts(i).nonEmpty && tl.singles.contains(ts(i))) hits += 1
      i += 1
    }
    var p = 0
    while (p < tl.phrases.length) {
      val ph = tl.phrases(p)
      var start = 0
      while (start + ph.length <= ts.length) {
        var j = 0
        while (j < ph.length && ts(start + j) == ph(j)) j += 1
        if (j == ph.length) hits += 1
        start += 1
      }
      p += 1
    }
    hits
  }
}
