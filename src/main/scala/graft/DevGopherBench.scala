package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.xxh3_64

/** Dev utility (`runMain graft.DevGopherBench <sfDir>`): A/B of the fused
  * Gopher kernels (gopher_signals struct + staged gopher_keep) against the
  * per-signal composition, across the three shapes that matter — audit
  * (all signals materialized), filter-only on a reject-heavy corpus
  * (short-circuit regime), and filter-only / filter-then-audit on a corpus
  * that mostly passes. The measurements behind gopherFilter's plan shape;
  * results recorded in the round notes. */
object DevGopherBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet").localCheckpoint()
    println("[dev] docs=" + docs.count())
    import graft.operators.TextQuality
    def timed(name: String)(f: => Long): Unit = {
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[dev] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      }
    }
    val sigNames = TextQuality.gopherFilter(docs.limit(1)).columns
      .filterNot(docs.columns.contains).filterNot(_ == "keep")
    def consumeAll(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sigNames.map(n => sum(col(n).cast("double"))): _*)
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).map(_.toLong).sum
    def perSignal(d: org.apache.spark.sql.DataFrame) =
      d.select(col("*") +:
          TextQuality.gopherSignals(col("text")).map { case (n, c) => c.as(n) }: _*)
        .withColumn("keep", coalesce(TextQuality.keepRule(), lit(false)))
    // audit mode: every signal column materialized (the gate-query shape)
    timed("fused ALL signals") { consumeAll(TextQuality.gopherFilter(docs)) }
    timed("per-signal ALL signals") { consumeAll(perSignal(docs)) }
    // filter-only mode on an early-reject corpus (keep short-circuits)
    timed("fused keep-only (all rejected)") {
      TextQuality.gopherFilter(docs).filter(col("keep")).count()
    }
    timed("per-signal keep-only (all rejected)") {
      perSignal(docs).filter(col("keep")).count()
    }
    timed("gopher_keep keep-only (all rejected)") {
      docs.filter(TextQuality.keepColumn()).count()
    }
    // filter-only mode on a corpus that mostly PASSES (every rule evaluated)
    val goodWords = graft.core.text.TextOps.GopherStopwords
    val good = spark.range(200000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 60).map(j =>
        when(lit(j) < 8, lit(goodWords(j % 8))).otherwise(
          format_string("w" + j + "%x", pmod(xxh3_64(concat(col("id").cast("string"),
            lit(s"#$j"))), lit(1L << 20))))): _*).as("text")).localCheckpoint()
    println("[dev] good docs=" + good.count())
    timed("fused keep-only (mostly pass)") {
      TextQuality.gopherFilter(good).filter(col("keep")).count()
    }
    timed("per-signal keep-only (mostly pass)") {
      perSignal(good).filter(col("keep")).count()
    }
    timed("gopher_keep keep-only (mostly pass)") {
      good.filter(TextQuality.keepColumn()).count()
    }
    timed("fused filter-then-audit (mostly pass)") {
      consumeAll(TextQuality.gopherFilter(good).filter(col("keep")))
    }
    timed("per-signal filter-then-audit (mostly pass)") {
      consumeAll(perSignal(good).filter(col("keep")))
    }
    spark.stop()
  }
}
