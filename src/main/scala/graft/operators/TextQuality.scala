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
      8 -> 0.12, 9 -> 0.11, 10 -> 0.10))

/**
 * Document quality filtering — the signals composed into the full
 * published rule, one call: `gopherFilter` returns every signal column
 * plus a `keep` boolean (true iff EVERY rule passes), so a pipeline can
 * either `.filter(col("keep"))` or audit which rule rejected a page.
 *
 * Purely row-local (codegen'd scalar signals, no shuffle, no state) — a
 * cheap pre-filter to run before any dedup join touches the corpus. Each
 * signal kernel tokenizes independently (~15 passes over the text per
 * row); a fused single-pass struct kernel is the known next optimization
 * if this ever dominates a profile — the per-signal expressions stay for
 * a-la-carte use either way.
 */
object TextQuality {

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
    * quarantined partition of a filter/negate pair). One select, not a
    * withColumn fold (each withColumn re-resolves the whole projection). */
  def gopherFilter(docs: DataFrame, t: GopherThresholds = GopherThresholds(),
                   textCol: String = "text"): DataFrame = {
    val sigs = gopherSignals(col(textCol), t)
    docs.select(col("*") +: sigs.map { case (name, c) => c.as(name) }: _*)
      .withColumn("keep", coalesce(keepRule(t), lit(false)))
  }
}
