package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** The COMPLETE Gopher quality-filter rule (Rae et al. 2021, Table A1 —
  * the published web-text filter) thresholds; defaults are the paper's.
  * Line-level rules use "\n" lines (the paper's paragraph variants use
  * "\n\n"; pass a paragraph-joined text for those). */
case class GopherThresholds(
    minWords: Int = 50, maxWords: Int = 100000,
    minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
    maxHashRatio: Double = 0.1, maxEllipsisRatio: Double = 0.1,
    maxBulletLineRatio: Double = 0.9, maxEllipsisLineRatio: Double = 0.3,
    minAlphaWordRatio: Double = 0.8, minStopwordHits: Int = 2,
    maxDupLineRatio: Double = 0.3, maxDupLineCharRatio: Double = 0.2,
    maxTopNgramRatio: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
    maxDupNgramRatio: Map[Int, Double] = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
      8 -> 0.12, 9 -> 0.11, 10 -> 0.10)) {
  /** The kernel-side parameter form ([[graft.core.text.TextOps.gopherKeep]]). */
  def toParams: graft.core.text.TextOps.GopherParams = {
    val tops = maxTopNgramRatio.toSeq.sortBy(_._1)
    val dups = maxDupNgramRatio.toSeq.sortBy(_._1)
    graft.core.text.TextOps.GopherParams(
      minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxHashRatio, maxEllipsisRatio, maxBulletLineRatio, maxEllipsisLineRatio,
      minAlphaWordRatio, minStopwordHits, maxDupLineRatio, maxDupLineCharRatio,
      tops.map(_._1).toArray, tops.map(_._2).toArray,
      dups.map(_._1).toArray, dups.map(_._2).toArray)
  }
}

/**
 * Document quality filtering — the signals composed into the full
 * published rule, one call: `gopherFilter` returns every signal column
 * plus a `keep` boolean (true iff EVERY rule passes), so a pipeline can
 * either `.filter(col("keep"))` or audit which rule rejected a page.
 *
 * Purely row-local (codegen'd scalar signals, no shuffle, no state) — a
 * cheap pre-filter to run before any dedup join touches the corpus.
 * `gopherFilter` evaluates the FUSED single-pass struct kernel
 * (`gopher_signals`: one tokenization + an incremental gram-hash chain
 * for every signal, instead of ~15 independent tokenizations per row —
 * this operator runs over EVERY page of a crawl before any join, so
 * per-row cost is the whole cost). The per-signal expressions behind
 * [[gopherSignals]] remain for a-la-carte use; a property test pins the
 * fused kernel's 19 values to the individual kernels bit-for-bit.
 */
object TextQuality {

  private[operators] val baseSignalNames = Seq(
    "n_words", "mean_word_len", "hash_ratio", "ellipsis_ratio",
    "bullet_line_ratio", "ellipsis_line_ratio", "alpha_word_ratio",
    "stopword_hits", "dup_line_ratio", "dup_line_char_ratio")

  def gopherSignals(text: Column, t: GopherThresholds = GopherThresholds()): Seq[(String, Column)] = {
    // WORD-level signals see newlines, carriage returns and tabs as
    // separators (the engine's single-space tokenizer would otherwise glue
    // "a\nb" or CRLF-ended words into one token and miss stopwords/n-grams
    // across breaks — routine in crawled text); LINE-level signals run on
    // the raw text (their kernels already trim \r\t as whitespace). Symbol
    // counts are break-invariant either way.
    val wordText = regexp_replace(text, "[\n\r\t]", " ")
    val base = Seq(
      "n_words" -> word_count(wordText).cast("long"),
      "mean_word_len" -> mean_word_len(wordText),
      "hash_ratio" -> symbol_word_ratio(wordText, "#"),
      "ellipsis_ratio" -> (symbol_word_ratio(wordText, "...") + symbol_word_ratio(wordText, "…")),
      "bullet_line_ratio" -> bullet_line_ratio(text),
      "ellipsis_line_ratio" -> ellipsis_line_ratio(text),
      "alpha_word_ratio" -> alpha_word_ratio(wordText),
      "stopword_hits" -> stopword_hits(wordText),
      "dup_line_ratio" -> dup_line_ratio(text),
      "dup_line_char_ratio" -> dup_line_char_ratio(text))
    val tops = t.maxTopNgramRatio.keys.toSeq.sorted.map(n =>
      s"top_${n}gram_ratio" -> top_ngram_char_ratio(wordText, n))
    val dups = t.maxDupNgramRatio.keys.toSeq.sorted.map(n =>
      s"dup_${n}gram_ratio" -> dup_ngram_char_ratio(wordText, n))
    base ++ tops ++ dups
  }

  /** keep = conjunction of every Gopher rule over the signal COLUMNS (so
    * the signals compute once per row and the plan stays one projection). */
  def keepRule(t: GopherThresholds = GopherThresholds()): Column = {
    val base = Seq(
      col("n_words") >= t.minWords, col("n_words") <= t.maxWords,
      col("mean_word_len") >= t.minMeanWordLen, col("mean_word_len") <= t.maxMeanWordLen,
      col("hash_ratio") <= t.maxHashRatio, col("ellipsis_ratio") <= t.maxEllipsisRatio,
      col("bullet_line_ratio") <= t.maxBulletLineRatio,
      col("ellipsis_line_ratio") <= t.maxEllipsisLineRatio,
      col("alpha_word_ratio") >= t.minAlphaWordRatio,
      col("stopword_hits") >= t.minStopwordHits,
      col("dup_line_ratio") <= t.maxDupLineRatio,
      col("dup_line_char_ratio") <= t.maxDupLineCharRatio)
    val tops = t.maxTopNgramRatio.toSeq.map { case (n, m) => col(s"top_${n}gram_ratio") <= m }
    val dups = t.maxDupNgramRatio.toSeq.map { case (n, m) => col(s"dup_${n}gram_ratio") <= m }
    (base ++ tops ++ dups).reduce(_ && _)
  }

  /** Input columns + every signal + `keep`. `.filter(col("keep"))` to
    * apply; keep the signal columns for audit/ablation. The decision is
    * TOTAL: a NULL text yields NULL signals but keep = false (a
    * three-valued keep would drop such rows from BOTH the kept and the
    * quarantined partition of a filter/negate pair).
    *
    * Plan shape: ONE `gopher_signals` struct per row, expanded to the same
    * 19 signal columns (names, types, order) the per-signal composition
    * produced. Projection collapse turns the expansion into 19
    * GetStructField copies of the struct expression, and whole-stage
    * codegen's subexpression elimination evaluates the kernel once per
    * row — pinned by the invocation-count test. `keep` is the SEPARATE
    * short-circuiting `gopher_keep` kernel (always equal to the rule over
    * the signal columns — pinned by test): when a caller
    * `.filter(col("keep"))`s, the pushed-down predicate is one cheap
    * staged kernel call, and the 19-signal struct is only evaluated for
    * SURVIVORS — a keep derived from the struct columns would instead
    * re-evaluate the struct per conjunct inside FilterExec. */
  def gopherFilter(docs: DataFrame, t: GopherThresholds = GopherThresholds(),
                   textCol: String = "text"): DataFrame = {
    val topNs = t.maxTopNgramRatio.keys.toSeq.sorted
    val dupNs = t.maxDupNgramRatio.keys.toSeq.sorted
    val names = baseSignalNames ++
      topNs.map(n => s"top_${n}gram_ratio") ++ dupNs.map(n => s"dup_${n}gram_ratio")
    docs.select(col("*"),
        graft.functions.GraftFunctions.gopher_signals(col(textCol), topNs, dupNs).as("__gs"))
      .select(docs.columns.map(col).toIndexedSeq ++
        names.map(f => col(s"__gs.$f").as(f)): _*)
      .withColumn("keep", keepColumn(t, textCol))
  }

  /** The keep decision alone (one staged short-circuiting kernel; total:
    * NULL text -> false). For pure filtering use
    * `docs.filter(TextQuality.keepColumn())` — no signal columns are ever
    * computed for rejected rows. */
  def keepColumn(t: GopherThresholds = GopherThresholds(),
                 textCol: String = "text"): Column =
    coalesce(graft.functions.GraftFunctions.gopher_keep(col(textCol), t.toParams),
      lit(false))

  /** C4-style wordlist (badwords) filter: drop documents with more than
    * `maxHits` occurrences of listed terms (default 0 = any hit drops,
    * the published C4 rule). Terms may be words or phrases; matching is
    * punctuation-stripped, case-insensitive, and runs as ONE codegen'd
    * scalar per row — no joins, the list ships per executor. */
  def wordlistFilter(docs: DataFrame, terms: Seq[String],
                     textCol: String = "text", maxHits: Int = 0): DataFrame =
    docs.filter(coalesce(
      graft.functions.GraftFunctions.term_hits(col(textCol), terms) <= maxHits,
      lit(false)))
}
