package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: larger-scale soak of the training-pipeline operators on
  * synthetic data (`runMain graft.Soak`) — wall-clock evidence that the
  * plan shapes hold well past the gate SFs. Results are recorded in the
  * round notes; this is not part of the driver contract. */
object Soak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    graft.pipelines.Magnitude.tune(spark)
    import graft.functions.GraftFunctions._
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[soak] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // 200k-doc corpus of ~24-token texts (deterministic hex words)
    val docs = spark.range(200000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 24).map(j =>
        format_string("%012x", pmod(xxh3_64(concat(col("id").cast("string"),
          lit(s"#$j"))), lit(1L << 44)))): _*).as("text"))
      .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(9))))
      .localCheckpoint() // generation cost out of the measurements

    val bench = docs.filter(pmod(col("doc_id"), lit(200)) === 0) // 1000 docs
    timed("decontaminate 200k docs vs 1k benchmark (5-grams)") {
      println("[soak] contaminated=" + graft.operators.Dedup
        .contaminatedDocs(docs, bench, n = 5).count())
    }
    timed("stratified sample 200k docs, 9 strata, f=0.1") {
      println("[soak] sampled=" + graft.operators.Sampling
        .stratified(docs, "lang", 0.1).count())
    }

    // 2M-row packing over 1024 buckets
    val toks = spark.range(2000000).select(col("id").as("doc_id"),
        (pmod(xxh3_64(col("id").cast("string")), lit(900)) + 100).as("toks"),
        pmod(xxh3_64(concat(col("id").cast("string"), lit("b"))), lit(1024)).as("bucket"))
      .localCheckpoint()
    timed("packGreedy 2M docs, 1024 buckets, budget 4096") {
      println("[soak] packed=" + graft.operators.Packing
        .packGreedy(toks, "toks", 4096, "bucket").count())
    }
    timed("packConcat 2M docs, 1024 buckets, budget 4096") {
      println("[soak] packed=" + graft.operators.Packing
        .packConcat(toks, "toks", 4096, "bucket").count())
    }
    timed("packBestFit 2M docs, 1024 buckets, budget 4096") {
      println("[soak] packed=" + graft.operators.Packing
        .packBestFit(toks, "toks", 4096, "bucket").count())
    }

    // simhash at the hard radius over 200k near-random signatures
    timed("simhashPairs maxHamming=10, 200k docs") {
      println("[soak] pairs=" + graft.operators.Dedup
        .simhashPairs(docs, maxHamming = 10).count())
    }

    // boilerplate strip: 3-line docs, one cookie banner in 20% of 200k
    val ml = docs.select(col("doc_id"),
      concat_ws("\n", substring(col("text"), 1, 60),
        when(pmod(col("doc_id"), lit(5)) === 0,
          lit("this site uses cookies accept to continue")).otherwise(substring(col("text"), 61, 60)),
        concat(lit("u"), col("doc_id").cast("string"))).as("text"))
    timed("stripBoilerplateLines 200k docs (banner in 40k)") {
      println("[soak] docs_out=" + graft.operators.Dedup
        .stripBoilerplateLines(ml, minDf = 1000).count())
    }

    // aggressive shard-level paragraph dedup (the CCNet regime): minDf=2
    // where a third of 900k distinct lines qualify — the corpus-scale
    // boilerplate set that a forced broadcast would push through the
    // driver; here AQE sees the pinned set's true size and decides
    val hd = docs.select(col("doc_id"), concat_ws("\n",
      (0 until 3).map(j => format_string(s"s$j-%012x",
        pmod(xxh3_64(concat((col("doc_id") / 2).cast("long").cast("string"),
          lit(s"s$j"))), lit(1L << 44)))) ++
      (3 until 6).map(j => format_string(s"u$j-%012x",
        pmod(xxh3_64(concat(col("doc_id").cast("string"),
          lit(s"u$j"))), lit(1L << 44)))): _*).as("text"))
    timed("stripBoilerplateLines 200k docs minDf=2 (300k of 900k lines boilerplate)") {
      println("[soak] docs_out=" + graft.operators.Dedup
        .stripBoilerplateLines(hd, minDf = 2).count())
    }

    // streaming-parity signature build over the corpus (per-row kernel)
    timed("minhashSignatures k=32 over 200k docs") {
      println("[soak] sigs=" + graft.operators.Dedup
        .minhashSignatures(docs, n = 3, numHashes = 32).count())
    }
    spark.stop()
  }
}
