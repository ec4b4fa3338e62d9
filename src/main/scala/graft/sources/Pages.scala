package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.core.hash.XXH3
import graft.core.text.HtmlText

/** One Common-Crawl-style page row (BASELINE.json input_hint schema). */
case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/**
 * Deterministic synthetic pages source (seed folded into XXH3 salts; no
 * Date.now / Math.random anywhere). Every column is a pure function of the
 * row id, so the same id yields the same bytes on any partition, any
 * executor, any parallelism — which is what makes the byte-identical
 * `extract_text` invariant and the kill/resume test meaningful.
 *
 * Distribution (per FIXTURES.md §4):
 *  - hosts: 3 hot hosts take ~20% of rows (exercises the salted-shuffle skew
 *    path); the rest uniform over `hosts` names `host-%06d.example`.
 *  - warc_ts: uniform over `days` consecutive UTC days from 2000-01-01.
 *  - text: token stream, length lognormal-ish via Box-Muller on two hash
 *    uniforms (gives t-digest/KLL something non-trivial to summarize).
 *  - html: HtmlText.wrap(text) so extract_text(html) == text byte-exactly.
 *  - lang in {en, de, sv, fr} by hash.
 */
object Pages {

  final val Epoch2000Millis = 946684800000L // 2000-01-01T00:00:00Z

  def generate(spark: SparkSession, n: Long, hosts: Int = 500, days: Int = 3,
               partitions: Int = 32): Dataset[PageRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map(id => rowFor(id, hosts, days))
  }

  /** As DataFrame with the exact input_hint column order. */
  def generateDf(spark: SparkSession, n: Long, hosts: Int = 500, days: Int = 3,
                 partitions: Int = 32): DataFrame =
    generate(spark, n, hosts, days, partitions)
      .toDF() // url, warc_ts, html, text, lang

  @inline private def salted(id: Long, salt: Long): Long = {
    val bb = new Array[Byte](16)
    putLongLE(bb, 0, id)
    putLongLE(bb, 8, salt ^ 42L) // seed 42 folded into every draw
    XXH3.hash(bb)
  }

  @inline private def putLongLE(b: Array[Byte], off: Int, v: Long): Unit = {
    var i = 0
    while (i < 8) { b(off + i) = (v >>> (8 * i)).toByte; i += 1 }
  }

  /** uniform double in [0,1) from a hash */
  @inline private def unit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  def rowFor(id: Long, hosts: Int, days: Int): PageRow = {
    val hHost = salted(id, 1)
    val host =
      if ((hHost & 0xff) < 51) s"hot-${(hHost >>> 8) % 3}.example" // ~20% to 3 hot hosts
      else f"host-${java.lang.Long.remainderUnsigned(hHost >>> 8, hosts.toLong)}%06d.example"
    val url = s"https://$host/p/${java.lang.Long.toHexString(salted(id, 2))}"

    val dayMs = java.lang.Long.remainderUnsigned(salted(id, 3), days.toLong) * 86400000L
    val secMs = java.lang.Long.remainderUnsigned(salted(id, 4), 86400L) * 1000L
    val ts = new java.sql.Timestamp(Epoch2000Millis + dayMs + secMs)

    // lognormal-ish token count via Box-Muller over two hash uniforms
    val u1 = math.max(unit(salted(id, 5)), 1e-12)
    val u2 = unit(salted(id, 6))
    val z = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    val nTokens = math.min(math.max(math.exp(3.0 + 0.8 * z), 2.0), 2000.0).toInt

    val sb = new java.lang.StringBuilder(nTokens * 8)
    var t = 0
    var h = salted(id, 7)
    while (t < nTokens) {
      if (t > 0) sb.append(' ')
      sb.append("tok").append(java.lang.Long.remainderUnsigned(h, 50000L))
      h = h * 0x9E3779B97F4A7C15L + 1 // cheap splitmix-ish stream
      t += 1
    }
    val text = sb.toString
    val lang = (salted(id, 8) & 3) match {
      case 0 => "en"; case 1 => "de"; case 2 => "sv"; case _ => "fr"
    }
    PageRow(url, ts, HtmlText.wrap(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)), text, lang)
  }

  /** Materialize a day-partitioned parquet pages table (the Iceberg-shaped
    * layout of SURVEY.md §1.3) and return its path. Idempotent per
    * (dir, n, hosts, days). */
  def ensureParquet(spark: SparkSession, dir: String, n: Long, hosts: Int,
                    days: Int, partitions: Int = 128): String = {
    val path = new java.io.File(dir)
    val marker = new java.io.File(path, "_GRAFT_DONE")
    val stamp = s"$n|$hosts|$days"
    val current =
      if (marker.exists()) java.nio.file.Files.readString(marker.toPath) else ""
    // marker carries the generation parameters — a dir generated for a
    // different (n, hosts, days) is regenerated, never silently reused
    // (a stale 1M-row table with a new n would inflate bench throughput)
    if (current != stamp) {
      import org.apache.spark.sql.functions.{to_date, col}
      generateDf(spark, n, hosts, days, partitions)
        .withColumn("date", to_date(col("warc_ts")))
        .write.mode("overwrite").partitionBy("date").parquet(dir)
      java.nio.file.Files.writeString(marker.toPath, stamp)
    }
    dir
  }
}
