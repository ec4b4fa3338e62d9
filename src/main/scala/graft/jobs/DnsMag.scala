package graft.jobs

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.pipelines.DnsMagnitude
import graft.sources.RecordsCsv

/**
 * spark-submit entry point mirroring the reference CLI
 * (/root/reference/app/cmd/root.go: collect | aggregate | report | view) so
 * a dnsmag user can switch commands 1:1:
 *
 *   spark-submit --class graft.jobs.DnsMag engine.jar \
 *     collect  --input x.csv[.gz] [--tsv] --date 2000-01-01 --output state/
 *     aggregate --input stateA/ --input stateB/ [--force-date 2000-01-01] --output merged/
 *     report   --input merged/ --source NAME --source-type authoritative|recursive \
 *              [--top 2500] --output report.json
 *     view     --input merged/ [--top 20]
 *
 * State travels as the sketch_state parquet table (date, domain, hll,
 * queries) instead of CBOR files — same mergeable content, cluster-readable
 * layout (SURVEY.md §2.1 S6/S7 mapping).
 */
object DnsMag {

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }
  private def args2(args: Array[String], name: String): Seq[String] =
    args.zipWithIndex.filter(_._1 == name).flatMap { case (_, i) =>
      if (i + 1 < args.length) Some(args(i + 1)) else None
    }.toSeq

  def main(argv: Array[String]): Unit = {
    require(argv.nonEmpty, "usage: DnsMag collect|aggregate|report|view ...")
    val spark = SparkSession.builder()
      .appName(s"dnsmag-${argv(0)}")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    graft.pipelines.Magnitude.tune(spark)
    try run(spark, argv)
    finally spark.stop()
  }

  private[jobs] def run(spark: SparkSession, argv: Array[String]): Unit = {
    val cmd = argv(0)
    val rest = argv.drop(1)
    cmd match {
      case "collect" =>
        val input = arg(rest, "--input").getOrElse(sys.error("--input required"))
        val date = java.sql.Date.valueOf(arg(rest, "--date")
          .getOrElse(sys.error("--date YYYY-MM-DD required (no wall-clock defaults in jobs)")))
        val out = arg(rest, "--output").getOrElse(sys.error("--output required"))
        val recs = RecordsCsv.read(spark, input, tsv = rest.contains("--tsv"))
        // reference semantics: invalid records (negative count, bad IP past
        // the header heuristic) abort the collect
        // (/root/reference/internal/csv.go:98-110 returns an error)
        val bad = recs.filter(org.apache.spark.sql.functions.col("invalid")).count()
        if (bad > 0 && !rest.contains("--skip-invalid"))
          sys.error(s"$bad invalid record(s) in $input (pass --skip-invalid to drop them)")
        DnsMagnitude.collect(recs, date)
          .write.mode(SaveMode.Overwrite).parquet(out)

      case "aggregate" =>
        val inputs = args2(rest, "--input")
        require(inputs.nonEmpty, "--input required (repeatable)")
        val out = arg(rest, "--output").getOrElse(sys.error("--output required"))
        val force = arg(rest, "--force-date").map(java.sql.Date.valueOf)
        DnsMagnitude.aggregate(inputs.map(spark.read.parquet), forceDate = force)
          .write.mode(SaveMode.Overwrite).parquet(out)

      case "report" =>
        val input = arg(rest, "--input").getOrElse(sys.error("--input required"))
        val out = arg(rest, "--output").getOrElse(sys.error("--output required"))
        val source = arg(rest, "--source").getOrElse(sys.error("--source required"))
        val st = arg(rest, "--source-type").getOrElse(sys.error("--source-type required"))
        val top = arg(rest, "--top").map(_.toInt).getOrElse(2500)
        val docs = DnsMagnitude.reportJson(spark.read.parquet(input), source, st, top)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
          docs.mkString("\n") + "\n")

      case "view" =>
        val input = arg(rest, "--input").getOrElse(sys.error("--input required"))
        val top = arg(rest, "--top").map(_.toInt).getOrElse(20)
        // scalastyle:off println — the view command's purpose is stdout
        println(DnsMagnitude.statsText(spark.read.parquet(input), top))

      case other => sys.error(s"unknown command '$other' (collect|aggregate|report|view)")
    }
  }
}
