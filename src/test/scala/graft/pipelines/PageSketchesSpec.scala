package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

class PageSketchesSpec extends AnyFunSuite {

  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("page sketch suite: CM host freq, KLL/t-digest text length, Bloom urls, merge rollup") {
    val pages = graft.sources.Pages.generateDf(spark, 10000, hosts = 200, days = 2, partitions = 4).cache()
    val daily = PageSketches.build(pages).cache()
    assert(daily.count() === 2)

    // CM: hot host frequency within eps*N of exact (and never under)
    val hot = "hot-0.example"
    val day = daily.orderBy($"date").collect()(0)
    val date = day.getAs[java.sql.Date]("date")
    val exactHot = pages.filter(to_date($"warc_ts") === date &&
      host_of_url($"url") === hot).count()
    val estHot = daily.filter($"date" === date)
      .select(cms_est($"host_freq_cms", xxh3_64(lit(hot)))).collect()(0).getLong(0)
    val n = day.getAs[Long]("n_pages")
    assert(estHot >= exactHot)
    assert(estHot <= exactHot + (math.E / 2048.0 * n).toLong + 1)

    // KLL/t-digest medians of text length near the exact median
    val exactMedian = pages.filter(to_date($"warc_ts") === date)
      .select(length($"text").cast("double").as("tl"))
      .stat.approxQuantile("tl", Array(0.5), 0.0)(0)
    val kllMed = daily.filter($"date" === date)
      .select(kll_quantile($"text_len_kll", lit(0.5))).collect()(0).getDouble(0)
    val tdMed = daily.filter($"date" === date)
      .select(tdigest_quantile($"text_len_tdigest", lit(0.5))).collect()(0).getDouble(0)
    assert(math.abs(kllMed - exactMedian) / exactMedian < 0.1, s"kll $kllMed vs $exactMedian")
    assert(math.abs(tdMed - exactMedian) / exactMedian < 0.1, s"td $tdMed vs $exactMedian")

    // Bloom: every crawled url is contained
    val misses = pages.filter(to_date($"warc_ts") === date)
      .select(xxh3_64($"url").as("h"))
      .crossJoin(broadcast(daily.filter($"date" === date).select($"url_bloom")))
      .filter(!bloom_contains($"url_bloom", $"h"))
      .count()
    assert(misses === 0L)

    // merge rollup: total pages and HLL distinct across both days
    val total = PageSketches.merge(daily).collect()(0)
    assert(total.getAs[Long]("n_pages") === 10000L)
    val estUrls = spark.range(1)
      .select(hll_est(lit(total.getAs[Array[Byte]]("url_hll")))).collect()(0).getLong(0)
    val exactUrls = pages.select(countDistinct($"url")).collect()(0).getLong(0)
    assert(math.abs(estUrls.toDouble - exactUrls) / exactUrls < 0.03)

    // Misra-Gries rollup: 200 hosts < k=256 -> exact mode survives the
    // merge (err 0, every stored count == the exact per-host count)
    val mg = lit(total.getAs[Array[Byte]]("top_hosts_mg"))
    assert(spark.range(1).select(freq_err(mg)).collect()(0).getLong(0) === 0L)
    val mgWrong = pages.groupBy(xxh3_64(host_of_url($"url")).as("hh"))
      .agg(count(lit(1)).as("exact"))
      .filter(freq_lower_bound(mg, $"hh") =!= $"exact").count()
    assert(mgWrong === 0L)

    // KMV rollup: 10k distinct urls > k -> order-statistic estimate
    val kmvEst = spark.range(1)
      .select(kmv_est(lit(total.getAs[Array[Byte]]("url_kmv")))).collect()(0).getDouble(0)
    assert(math.abs(kmvEst - exactUrls) / exactUrls < 3.3 / math.sqrt(1022),
      s"kmv $kmvEst vs $exactUrls")
    // day-over-day url Jaccard: urls are distinct per page, so true
    // overlap is 0 — the coordinated estimate must be ~0 too
    val daySketches = daily.orderBy($"date").select($"url_kmv").collect()
    val jac = spark.range(1).select(kmv_jaccard(
      lit(daySketches(0).getAs[Array[Byte]](0)),
      lit(daySketches(1).getAs[Array[Byte]](0)))).collect()(0).getDouble(0)
    assert(jac < 0.02, s"disjoint-day jaccard $jac")
  }
}
