package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` of SparkEntry queries to files
  * (`runMain graft.ExplainQ <sfDir> <outDir> <name,name,...>`) — used for the
  * optimization-round plan evidence (plans/rNN/<query>_{before,after}.txt).
  * Session config mirrors graft.Bench so the captured plan is the plan the
  * driver's bench executes. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft_spark"))
      .config("spark.sql.files.maxPartitionBytes", (32 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    graft.pipelines.Magnitude.tune(spark)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    args(2).split(",").foreach { n =>
      val df = SparkEntry.queries(n)(spark, args(0))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"$n.txt"), txt)
      println(s"[explainq] wrote ${outDir.resolve(s"$n.txt")}")
    }
    spark.stop()
  }
}
