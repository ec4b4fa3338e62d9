package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: two-parallelism scaling evidence for a HEAVY operator (the
  * north-rule criterion applied beyond the sketch build):
  * `runMain graft.ScaleOp <cores> <nDocs>` runs MinHash-LSH near-dedup
  * (signatures + band join + exact verification) over a deterministic
  * synthetic corpus with planted near-dups and prints docs/sec. Results
  * recorded in BASELINE.md; not part of the driver contract. */
object ScaleOp {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = if (args.length > 1) args(1).toLong else 300000L
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    graft.pipelines.Magnitude.tune(spark)
    import graft.functions.GraftFunctions._
    // ~24-token docs; every 10th doc is a near-copy of its predecessor
    // (first 23 tokens shared, last token unique), so the join has real
    // pairs to verify
    val seed = when(pmod(col("id"), lit(10)) === 1, col("id") - 1).otherwise(col("id"))
    val toks = (0 until 23).map(j =>
      format_string("%011x", pmod(xxh3_64(concat(seed.cast("string"), lit(s"#$j"))),
        lit(1L << 42)))) :+
      format_string("%011x", pmod(xxh3_64(concat(col("id").cast("string"), lit("#u"))),
        lit(1L << 42)))
    val base = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ", toks: _*).as("text"))
      .localCheckpoint() // generation cost excluded
    val reps = 3
    val secs = (1 to reps).map { r =>
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.minhashLshPairs(base,
        n = 3, numHashes = 32, bands = 8, minJaccard = 0.5).count()
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scaleop] rep $r: $s%.2f s ($pairs pairs)")
      s
    }.min
    println(f"""{"op":"minhash_lsh","cores":$cores,"docs":$nDocs,"sec":$secs%.3f,"docs_per_sec":${nDocs / secs}%.0f}""")
    spark.stop()
  }
}
