package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * The north_star's page-level sketch suite in one pass: per day,
 *  - Count-Min of host frequency (which hosts dominate the crawl),
 *  - t-digest and KLL of extracted-text length (the quantile families),
 *  - Bloom membership over urls (have-we-crawled-this),
 *  - HLL of distinct urls (the magnitude denominator),
 *  - Misra-Gries top hosts (WHICH hosts dominate, not just how much —
 *    CM answers point queries, MG enumerates the heavy keys),
 *  - KMV bottom-k of urls (a mergeable coordinated sample of distinct
 *    urls + set-op estimates between days: Jaccard of crawl frontiers).
 *
 * One scan, one aggregation; every sketch column is mergeable, so daily
 * rows roll up to weekly/monthly by the *_merge aggregates — the same
 * property the magnitude pipeline rides.
 */
object PageSketches {

  def build(pages: DataFrame): DataFrame =
    pages.select(
        to_date(col("warc_ts")).as("date"),
        xxh3_64(host_of_url(col("url"))).as("host_hash"),
        xxh3_64(col("url")).as("url_hash"),
        length(col("text")).cast("double").as("text_len"))
      .groupBy(col("date"))
      .agg(
        cms_build(col("host_hash"), lit(1L)).as("host_freq_cms"),
        tdigest_build(col("text_len")).as("text_len_tdigest"),
        kll_build(col("text_len")).as("text_len_kll"),
        bloom_build(col("url_hash")).as("url_bloom"),
        hll_build(col("url_hash")).as("url_hll"),
        freq_build(col("host_hash"), lit(1L)).as("top_hosts_mg"),
        kmv_build(col("url_hash")).as("url_kmv"),
        count(lit(1)).as("n_pages"))

  /** Roll daily sketch rows up to one row (weekly/monthly/total). */
  def merge(daily: DataFrame): DataFrame =
    daily.agg(
      cms_merge(col("host_freq_cms")).as("host_freq_cms"),
      tdigest_merge(col("text_len_tdigest")).as("text_len_tdigest"),
      kll_merge(col("text_len_kll")).as("text_len_kll"),
      bloom_merge(col("url_bloom")).as("url_bloom"),
      hll_merge(col("url_hll")).as("url_hll"),
      freq_merge(col("top_hosts_mg")).as("top_hosts_mg"),
      kmv_merge(col("url_kmv")).as("url_kmv"),
      sum(col("n_pages")).as("n_pages"))
}
