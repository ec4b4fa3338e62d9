package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.graftshim.shims.{column, expression}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.functions.{log => slog, lit}

/**
 * Public Column API for the graft sketch engine, plus SQL registration.
 *
 * Usage (DataFrame):
 * {{{
 *   import graft.functions.GraftFunctions._
 *   pages.groupBy(col("host")).agg(hll_build(xxh3_64(col("url"))).as("sk"))
 * }}}
 * Usage (SQL): `GraftFunctions.registerAll(spark)` then
 * `SELECT hll_est(hll_build(xxh3_64(url))) FROM pages`.
 */
object GraftFunctions {

  private def agg(a: AggregateFunction): Column = column(a.toAggregateExpression())

  // ----- scalar -----
  def xxh3_64(c: Column): Column = column(Xxh3(expression(c)))
  def truncate_ip(c: Column): Column = column(TruncateIp(expression(c)))
  def normalize_domain(c: Column, numLabels: Int = 1): Column =
    column(NormalizeDomain(expression(c), numLabels))
  def unescape_domain(c: Column): Column = column(UnescapeDomain(expression(c)))
  def host_of_url(c: Column): Column = column(HostOfUrl(expression(c)))
  def extract_text(c: Column): Column = column(ExtractText(expression(c)))

  /** magnitude = log(clients)/log(total) * 10 — deliberately unclamped, like
    * the reference (/root/reference/internal/dataset.go:110-114). */
  def magnitude(clients: Column, total: Column): Column =
    slog(clients.cast("double")) / slog(total.cast("double")) * lit(10.0)

  // ----- text analysis -----
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def fingerprint64(c: Column): Column = column(Fingerprint64(expression(c)))
  def winnow_min64(c: Column): Column = column(WinnowMin64(expression(c)))
  def lang_id(c: Column): Column = column(LangId(expression(c)))
  def lang_id_conf(c: Column): Column = column(LangIdConf(expression(c)))
  def html_text(c: Column): Column = column(HtmlTextOf(expression(c)))
  def nfc(c: Column): Column = column(NfcNormalize(expression(c)))
  def nfkc(c: Column): Column = column(NfkcNormalize(expression(c)))
  def fix_mojibake(c: Column): Column = column(FixMojibake(expression(c)))
  def mojibake_score(c: Column): Column = column(MojibakeScore(expression(c)))
  def html_title(c: Column): Column = column(HtmlTitleOf(expression(c)))
  def html_links(c: Column): Column = column(HtmlLinksOf(expression(c)))
  def html_anchors(c: Column): Column = column(HtmlAnchorsOf(expression(c)))
  def robots_rules(content: Column, agent: String): Column =
    column(RobotsRules(expression(content), agent))
  def robots_match(pattern: Column, path: Column): Column =
    column(RobotsMatch(expression(pattern), expression(path)))
  def term_hits(c: Column, terms: Seq[String]): Column =
    column(TermHits(expression(c), terms))
  def token_count_bpeish(c: Column): Column = column(TokenCountBpeish(expression(c)))
  def alpha_ratio(c: Column): Column = column(AlphaRatio(expression(c)))
  def punct_ratio(c: Column): Column = column(PunctRatio(expression(c)))
  def canonicalize_url(c: Column): Column = column(CanonicalizeUrl(expression(c)))
  def winnow_set(c: Column, k: Int = 8, w: Int = 4): Column =
    column(WinnowSet(expression(c), k, w))
  def minhash_sig(shingles: Column, k: Int): Column =
    column(MinHashSig(expression(shingles), k))
  def chunk_text(c: Column, maxTokens: Int, overlap: Int = 0): Column =
    column(ChunkText(expression(c), maxTokens, overlap))
  def stopword_ratio(c: Column): Column = column(StopwordRatio(expression(c)))
  def mean_word_len(c: Column): Column = column(MeanWordLen(expression(c)))
  def max_token_ratio(c: Column): Column = column(MaxTokenRatio(expression(c)))
  def dup_line_ratio(c: Column): Column = column(DupLineRatio(expression(c)))
  def top_ngram_char_ratio(c: Column, n: Int): Column =
    column(TopNgramCharRatio(expression(c), n))
  def dup_ngram_char_ratio(c: Column, n: Int): Column =
    column(DupNgramCharRatio(expression(c), n))
  def word_count(c: Column): Column = column(WordCount(expression(c)))
  def bullet_line_ratio(c: Column): Column = column(BulletLineRatio(expression(c)))
  def ellipsis_line_ratio(c: Column): Column = column(EllipsisLineRatio(expression(c)))
  def alpha_word_ratio(c: Column): Column = column(AlphaWordRatio(expression(c)))
  def stopword_hits(c: Column): Column = column(StopwordHits(expression(c)))
  def symbol_word_ratio(c: Column, symbol: String): Column =
    column(SymbolWordRatio(expression(c), symbol))
  /** Every Gopher signal as one struct from ONE pass over the text (the
    * per-signal functions above re-tokenize per call). */
  def gopher_signals(c: Column, topNs: Seq[Int] = Seq(2, 3, 4),
                     dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): Column =
    column(GopherSignalsStruct(expression(c), topNs, dupNs))
  /** The full Gopher keep decision as one short-circuiting boolean kernel
    * (fast path for pure filtering; see [[GopherKeep]]). */
  def gopher_keep(c: Column, p: graft.core.text.TextOps.GopherParams): Column =
    column(GopherKeep(expression(c), p))
  def rolling_kgram_hashes(c: Column, k: Int, stride: Int = 1): Column =
    column(RollingKgramHashes(expression(c), k, stride))
  def merge_spans(positions: Column, winLen: Int): Column =
    column(MergeSpans(expression(positions), winLen))
  def http_body(c: Column): Column = column(HttpBody(expression(c)))
  def splice_out(text: Column, spans: Column): Column =
    column(SpliceOut(expression(text), expression(spans)))
  def dup_line_char_ratio(c: Column): Column = column(DupLineCharRatio(expression(c)))
  def char_entropy(c: Column): Column = column(CharEntropy(expression(c)))
  def word_ngram_counts(c: Column, n: Int): Column =
    column(WordNgramCounts(expression(c), n))
  def hashed_ngram_features(c: Column, dim: Int, maxN: Int = 2): Column =
    column(HashedNgramFeatures(expression(c), dim, maxN))
  def linear_score_lit(feats: Column, weights: Array[Double], bias: Double): Column =
    column(LinearScoreLit(expression(feats), weights, bias))
  def l2ap_prefix(keys: Column, weights: Column, t: Double): Column =
    column(L2apPrefix(expression(keys), expression(weights), t))
  def sorted_weighted_dot(ka: Column, wa: Column, kb: Column, wb: Column): Column =
    column(SortedWeightedDot(expression(ka), expression(wa), expression(kb), expression(wb)))

  // ----- estimators -----
  def hll_est(sketch: Column): Column = column(HllEst(expression(sketch)))
  def cms_est(sketch: Column, hash: Column): Column =
    column(CmsEst(expression(sketch), expression(hash)))
  def bloom_contains(sketch: Column, hash: Column): Column =
    column(BloomContains(expression(sketch), expression(hash)))
  def tdigest_quantile(sketch: Column, q: Column): Column =
    column(TDigestQuantile(expression(sketch), expression(q)))
  def tdigest_cdf(sketch: Column, x: Column): Column =
    column(TDigestCdf(expression(sketch), expression(x)))
  def kll_quantile(sketch: Column, q: Column): Column =
    column(KllQuantile(expression(sketch), expression(q)))
  def kll_rank(sketch: Column, x: Column): Column =
    column(KllRank(expression(sketch), expression(x)))
  def kll_splits(sketch: Column, buckets: Column): Column =
    column(KllSplits(expression(sketch), expression(buckets)))
  /** AK-spec scalar union — named _ak to avoid shadowing Spark's builtin
    * hll_union (which operates on DataSketches-format bytes). */
  def hll_union_ak(a: Column, b: Column): Column =
    column(HllUnion(expression(a), expression(b)))
  def kmv_est(sketch: Column): Column = column(KmvEst(expression(sketch)))
  def kmv_hashes(sketch: Column): Column = column(KmvHashes(expression(sketch)))
  def kmv_jaccard(a: Column, b: Column): Column =
    column(KmvJaccard(expression(a), expression(b)))
  def kmv_union(a: Column, b: Column): Column =
    column(KmvUnion(expression(a), expression(b)))
  def freq_items(sketch: Column): Column = column(FreqItemsList(expression(sketch)))
  def freq_top(sketch: Column, k: Column): Column =
    column(FreqTop(expression(sketch), expression(k)))
  def freq_err(sketch: Column): Column = column(FreqItemsErr(expression(sketch)))
  def freq_lower_bound(sketch: Column, hash: Column): Column =
    column(FreqItemsLowerBound(expression(sketch), expression(hash)))

  // ----- aggregates (build from raw values) -----
  def hll_build(hash: Column): Column = agg(HllBuildAgg(expression(hash)))
  def cms_build(hash: Column, count: Column): Column =
    agg(CmsBuildAgg(expression(hash), expression(count)))
  def bloom_build(hash: Column): Column = agg(BloomBuildAgg(expression(hash)))
  def tdigest_build(x: Column): Column = agg(TDigestBuildAgg(expression(x)))
  def kll_build(x: Column): Column = agg(KllBuildAgg(expression(x)))
  def kmv_build(hash: Column, k: Int = graft.core.sketch.Kmv.DefaultK): Column =
    agg(KmvBuildAgg(expression(hash), k))
  def freq_build(hash: Column, weight: Column,
      k: Int = graft.core.sketch.FreqItems.DefaultK): Column =
    agg(FreqItemsBuildAgg(expression(hash), expression(weight), k))

  // ----- aggregates (merge stored sketch bytes) -----
  def hll_merge(sketch: Column): Column = agg(HllMergeAgg(expression(sketch)))
  def cms_merge(sketch: Column): Column = agg(CmsMergeAgg(expression(sketch)))
  def bloom_merge(sketch: Column): Column = agg(BloomMergeAgg(expression(sketch)))
  def tdigest_merge(sketch: Column): Column = agg(TDigestMergeAgg(expression(sketch)))
  def kll_merge(sketch: Column): Column = agg(KllMergeAgg(expression(sketch)))
  def kmv_merge(sketch: Column): Column = agg(KmvMergeAgg(expression(sketch)))
  def freq_merge(sketch: Column): Column = agg(FreqItemsMergeAgg(expression(sketch)))
  def vec_sum(v: Column): Column = agg(VecSumAgg(expression(v)))

  /** All SQL-callable names -> expression builders. */
  private[functions] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "xxh3_64" -> (e => Xxh3(e.head)),
    "truncate_ip" -> (e => TruncateIp(e.head)),
    "normalize_domain" -> (e => NormalizeDomain(e.head,
      if (e.length > 1) e(1).eval().toString.toInt else 1)),
    "unescape_domain" -> (e => UnescapeDomain(e.head)),
    "host_of_url" -> (e => HostOfUrl(e.head)),
    "domain_suffixes" -> (e => DomainSuffixes(e.head)),
    "extract_text" -> (e => ExtractText(e.head)),
    "simhash64" -> (e => SimHash64(e.head)),
    "fingerprint64" -> (e => Fingerprint64(e.head)),
    "winnow_min64" -> (e => WinnowMin64(e.head)),
    "lang_id" -> (e => LangId(e.head)),
    "lang_id_conf" -> (e => LangIdConf(e.head)),
    "html_text" -> (e => HtmlTextOf(e.head)),
    "nfc" -> (e => NfcNormalize(e.head)),
    "nfkc" -> (e => NfkcNormalize(e.head)),
    "fix_mojibake" -> (e => FixMojibake(e.head)),
    "mojibake_score" -> (e => MojibakeScore(e.head)),
    "html_title" -> (e => HtmlTitleOf(e.head)),
    "html_links" -> (e => HtmlLinksOf(e.head)),
    "html_anchors" -> (e => HtmlAnchorsOf(e.head)),
    "robots_rules" -> (e => RobotsRules(e.head, e(1).eval().toString)),
    "robots_match" -> (e => RobotsMatch(e.head, e(1))),
    "term_hits" -> (e => TermHits(e.head,
      e(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq)),
    "token_count_bpeish" -> (e => TokenCountBpeish(e.head)),
    "alpha_ratio" -> (e => AlphaRatio(e.head)),
    "punct_ratio" -> (e => PunctRatio(e.head)),
    "canonicalize_url" -> (e => CanonicalizeUrl(e.head)),
    "stopword_ratio" -> (e => StopwordRatio(e.head)),
    "mean_word_len" -> (e => MeanWordLen(e.head)),
    "max_token_ratio" -> (e => MaxTokenRatio(e.head)),
    "dup_line_ratio" -> (e => DupLineRatio(e.head)),
    "dup_line_char_ratio" -> (e => DupLineCharRatio(e.head)),
    "char_entropy" -> (e => CharEntropy(e.head)),
    "word_count" -> (e => WordCount(e.head)),
    "bullet_line_ratio" -> (e => BulletLineRatio(e.head)),
    "ellipsis_line_ratio" -> (e => EllipsisLineRatio(e.head)),
    "alpha_word_ratio" -> (e => AlphaWordRatio(e.head)),
    "stopword_hits" -> (e => StopwordHits(e.head)),
    "symbol_word_ratio" -> (e => SymbolWordRatio(e.head, e(1).eval().toString)),
    "gopher_signals" -> (e => GopherSignalsStruct(e.head,
      Seq(2, 3, 4), Seq(5, 6, 7, 8, 9, 10))),
    // paper-default thresholds; GopherThresholds() is the single source of
    // truth for the published Table A1 values (the operators package also
    // depends on this one — an intentional same-module cycle beats
    // duplicating the defaults)
    "gopher_keep" -> (e => GopherKeep(e.head,
      graft.operators.GopherThresholds().toParams)),
    "winnow_set" -> (e => WinnowSet(e.head,
      if (e.length > 1) e(1).eval().toString.toInt else 8,
      if (e.length > 2) e(2).eval().toString.toInt else 4)),
    "chunk_text" -> (e => ChunkText(e.head, e(1).eval().toString.toInt,
      if (e.length > 2) e(2).eval().toString.toInt else 0)),
    "http_body" -> (e => HttpBody(e.head)),
    "rolling_kgram_hashes" -> (e => RollingKgramHashes(e.head,
      e(1).eval().toString.toInt,
      if (e.length > 2) e(2).eval().toString.toInt else 1)),
    "merge_spans" -> (e => MergeSpans(e.head, e(1).eval().toString.toInt)),
    "splice_out" -> (e => SpliceOut(e.head, e(1))),
    "top_ngram_char_ratio" -> (e => TopNgramCharRatio(e.head,
      if (e.length > 1) e(1).eval().toString.toInt else 2)),
    "dup_ngram_char_ratio" -> (e => DupNgramCharRatio(e.head,
      if (e.length > 1) e(1).eval().toString.toInt else 5)),
    "word_ngram_counts" -> (e => WordNgramCounts(e.head,
      if (e.length > 1) e(1).eval().toString.toInt else 2)),
    "hashed_ngram_features" -> (e => {
      require(e.length >= 2,
        "hashed_ngram_features(text, dim[, maxN]) — dim is required")
      HashedNgramFeatures(e.head, e(1).eval().toString.toInt,
        if (e.length > 2) e(2).eval().toString.toInt else 2)
    }),
    "word_shingles" -> (e => WordShingles(e.head,
      if (e.length > 1) e(1).eval().toString.toInt else 3)),
    "minhash_sig" -> (e => MinHashSig(e.head,
      if (e.length > 1) e(1).eval().toString.toInt else 32)),
    "hll_est" -> (e => HllEst(e.head)),
    "cms_est" -> (e => CmsEst(e.head, e(1))),
    "bloom_contains" -> (e => BloomContains(e.head, e(1))),
    // bloom_contains_lit(hash, <binary literal>): filter parsed once per
    // executor instead of per row — use for broadcast-style prefilters
    "bloom_contains_lit" -> (e => BloomContainsLit(e.head,
      e(1).eval().asInstanceOf[Array[Byte]])),
    "tdigest_quantile" -> (e => TDigestQuantile(e.head, e(1))),
    "tdigest_cdf" -> (e => TDigestCdf(e.head, e(1))),
    "kll_quantile" -> (e => KllQuantile(e.head, e(1))),
    "kll_rank" -> (e => KllRank(e.head, e(1))),
    "kll_splits" -> (e => KllSplits(e.head, e(1))),
    "hll_union_ak" -> (e => HllUnion(e.head, e(1))),
    "hll_build" -> (e => HllBuildAgg(e.head).toAggregateExpression()),
    "hll_merge" -> (e => HllMergeAgg(e.head).toAggregateExpression()),
    "cms_build" -> (e => CmsBuildAgg(e.head, e(1)).toAggregateExpression()),
    "cms_merge" -> (e => CmsMergeAgg(e.head).toAggregateExpression()),
    "bloom_build" -> (e => BloomBuildAgg(e.head).toAggregateExpression()),
    "bloom_merge" -> (e => BloomMergeAgg(e.head).toAggregateExpression()),
    "tdigest_build" -> (e => TDigestBuildAgg(e.head).toAggregateExpression()),
    "tdigest_merge" -> (e => TDigestMergeAgg(e.head).toAggregateExpression()),
    "kll_build" -> (e => KllBuildAgg(e.head).toAggregateExpression()),
    "kll_merge" -> (e => KllMergeAgg(e.head).toAggregateExpression()),
    "kmv_est" -> (e => KmvEst(e.head)),
    "kmv_hashes" -> (e => KmvHashes(e.head)),
    "kmv_jaccard" -> (e => KmvJaccard(e.head, e(1))),
    "kmv_union" -> (e => KmvUnion(e.head, e(1))),
    "kmv_build" -> (e => KmvBuildAgg(e.head,
      if (e.length > 1) e(1).eval().toString.toInt
      else graft.core.sketch.Kmv.DefaultK).toAggregateExpression()),
    "kmv_merge" -> (e => KmvMergeAgg(e.head).toAggregateExpression()),
    "freq_items" -> (e => FreqItemsList(e.head)),
    "freq_top" -> (e => FreqTop(e.head, e(1))),
    "freq_err" -> (e => FreqItemsErr(e.head)),
    "freq_lower_bound" -> (e => FreqItemsLowerBound(e.head, e(1))),
    "freq_build" -> (e => FreqItemsBuildAgg(e.head, e(1),
      if (e.length > 2) e(2).eval().toString.toInt
      else graft.core.sketch.FreqItems.DefaultK).toAggregateExpression()),
    "freq_merge" -> (e => FreqItemsMergeAgg(e.head).toAggregateExpression()),
    "vec_sum" -> (e => VecSumAgg(e.head).toAggregateExpression()))

  /** Register every function for SQL use in this session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injects the same
  * functions at session build time (for spark-submit deployments). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), b))
    }
  }
}
