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
 * queries) — same mergeable content, cluster-readable layout (SURVEY.md
 * §2.1 S6/S7 mapping). Paths ending in `.dnsmag` are read/written as the
 * reference's CBOR dataset files instead ([[graft.io.DnsMagCbor]]), so
 * state interchanges 1:1 with existing dnsmag deployments.
 */
object DnsMag {

  private def readState(spark: SparkSession, path: String) =
    if (path.endsWith(".dnsmag")) graft.io.DnsMagCbor.read(spark, path)
    else spark.read.parquet(path)

  private def writeState(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    if (path.endsWith(".dnsmag")) graft.io.DnsMagCbor.write(df, path)
    else df.write.mode(SaveMode.Overwrite).parquet(path)

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

  private[graft] def run(spark: SparkSession, argv: Array[String]): Unit = {
    val cmd = argv(0)
    val rest = argv.drop(1)
    cmd match {
      case "collect" =>
        val input = arg(rest, "--input").getOrElse(sys.error("--input required"))
        val out = arg(rest, "--output").getOrElse(sys.error("--output required"))
        val isPcap = input.endsWith(".pcap") || input.endsWith(".pcap.gz")
        val recs =
          if (isPcap) graft.sources.RecordsPcap.read(spark, input)
          else RecordsCsv.read(spark, input, tsv = rest.contains("--tsv"))
        val date = arg(rest, "--date").map(java.sql.Date.valueOf).getOrElse {
          // pcap carries packet timestamps: like the reference, default the
          // dataset date from the capture itself (earliest packet's UTC day,
          // pcap.go:36-41); CSV has no timestamps, so --date stays required
          if (!isPcap)
            sys.error("--date YYYY-MM-DD required for csv/tsv (no wall-clock defaults in jobs)")
          recs.agg(org.apache.spark.sql.functions.min(
              org.apache.spark.sql.functions.to_date(
                org.apache.spark.sql.functions.col("ts"))).as("d"))
            .collect()(0).getAs[java.sql.Date]("d")
        }
        // reference semantics: invalid records (negative count, bad IP past
        // the header heuristic) abort the collect
        // (/root/reference/internal/csv.go:98-110 returns an error). The
        // invalid count rides the SAME scan as the aggregation via observe()
        // — a separate pre-count doubles input IO at every scale — so the
        // check runs after the write and uncommits the output on failure.
        val obs = org.apache.spark.sql.Observation("graft_invalid")
        val observed = recs.observe(obs,
          org.apache.spark.sql.functions.coalesce(
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.when(
                org.apache.spark.sql.functions.col("invalid"), 1L).otherwise(0L)),
            org.apache.spark.sql.functions.lit(0L)).as("bad"))
        writeState(DnsMagnitude.collect(observed, date), out)
        val bad = obs.get("bad").asInstanceOf[Long]
        if (bad > 0 && !rest.contains("--skip-invalid")) {
          val p = new org.apache.hadoop.fs.Path(out)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          sys.error(s"$bad invalid record(s) in $input (pass --skip-invalid to drop them)")
        }

      case "aggregate" =>
        val inputs = args2(rest, "--input")
        require(inputs.nonEmpty, "--input required (repeatable)")
        val out = arg(rest, "--output").getOrElse(sys.error("--output required"))
        val force = arg(rest, "--force-date").map(java.sql.Date.valueOf)
        val states = inputs.map(readState(spark, _))
        // default: exact order-free merge; --chunked replays the reference
        // CLI's sequential fold with between-chunk --top truncation
        val merged =
          if (rest.contains("--chunked"))
            DnsMagnitude.aggregateChunked(states,
              topN = arg(rest, "--top").map(_.toInt).getOrElse(2500), forceDate = force)
          else DnsMagnitude.aggregate(states, forceDate = force)
        writeState(merged, out)

      case "report" =>
        val input = arg(rest, "--input").getOrElse(sys.error("--input required"))
        val out = arg(rest, "--output").getOrElse(sys.error("--output required"))
        val source = arg(rest, "--source").getOrElse(sys.error("--source required"))
        val st = arg(rest, "--source-type").getOrElse(sys.error("--source-type required"))
        val top = arg(rest, "--top").map(_.toInt).getOrElse(2500)
        val docs = DnsMagnitude.reportJson(readState(spark, input), source, st, top)
        // Hadoop FS write: report files land on HDFS/object stores too
        val p = new org.apache.hadoop.fs.Path(out)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val os = fs.create(p, true)
        try os.write((docs.mkString("\n") + "\n").getBytes("UTF-8"))
        finally os.close()

      case "view" =>
        val input = arg(rest, "--input").getOrElse(sys.error("--input required"))
        val top = arg(rest, "--top").map(_.toInt).getOrElse(20)
        // scalastyle:off println — the view command's purpose is stdout
        if (rest.contains("--json"))
          println(DnsMagnitude.statsJson(readState(spark, input)))
        else
          println(DnsMagnitude.statsText(readState(spark, input), top))

      case other => sys.error(s"unknown command '$other' (collect|aggregate|report|view)")
    }
  }
}
