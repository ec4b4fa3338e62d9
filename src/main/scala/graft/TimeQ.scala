package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries against an SF dir
  * (`runMain graft.TimeQ <sfDir> <name,name,...>`) without running the full
  * bench — used while tuning a single operator's plan. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    graft.pipelines.Magnitude.tune(spark)
    val metrics = new BenchMetrics
    spark.sparkContext.addSparkListener(metrics)
    args(1).split(",").foreach { n =>
      metrics.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, args(0)).write.mode("overwrite").format("noop").save()
      println(f"[timeq] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (sys.env.get("TIMEQ_STAGES").contains("1")) {
        Thread.sleep(300)
        println(metrics.summary(10))
      }
    }
    spark.stop()
  }
}
