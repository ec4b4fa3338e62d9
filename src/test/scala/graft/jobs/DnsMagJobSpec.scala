package graft.jobs

import org.scalatest.funsuite.AnyFunSuite

/** Drives the CLI-equivalent job end-to-end: collect two inputs ->
  * aggregate -> report, asserting the golden union estimate (92) lands in
  * the emitted JSON — the reference's `make test2` flow. */
class DnsMagJobSpec extends AnyFunSuite {

  lazy val spark = graft.SparkTestBase.spark

  test("collect -> aggregate -> report pipeline via the job CLI") {
    val dir = java.nio.file.Files.createTempDirectory("graft_job").toString
    val tsvPath = getClass.getResource("/test2.tsv").getPath
    // materialize test1 records as csv for the job
    val t1 = new java.io.File(dir, "test1.csv")
    val lines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/test1_records.tsv")).getLines()
      .map(_.split("\t").mkString(",")).mkString("\n")
    java.nio.file.Files.writeString(t1.toPath, lines)

    DnsMag.run(spark, Array("collect", "--input", t1.toString,
      "--date", "2000-01-01", "--output", s"$dir/state1"))
    DnsMag.run(spark, Array("collect", "--input", tsvPath, "--tsv",
      "--date", "2000-01-01", "--output", s"$dir/state2"))
    DnsMag.run(spark, Array("aggregate", "--input", s"$dir/state1",
      "--input", s"$dir/state2", "--output", s"$dir/merged"))
    DnsMag.run(spark, Array("report", "--input", s"$dir/merged",
      "--source", "fixtures", "--source-type", "recursive",
      "--output", s"$dir/report.json"))

    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/report.json"))
    assert(json.contains("\"totalUniqueClients\":92"))
    assert(json.contains("\"totalQueryVolume\":300"))
    assert(json.contains("\"sourceType\":\"recursive\""))
    // 7 domains in magnitudeData
    assert("\"domain\":".r.findAllIn(json).length === 7)

    // date-mismatch guard through the CLI
    DnsMag.run(spark, Array("collect", "--input", tsvPath, "--tsv",
      "--date", "2000-01-05", "--output", s"$dir/state3"))
    val e = intercept[IllegalArgumentException] {
      DnsMag.run(spark, Array("aggregate", "--input", s"$dir/state1",
        "--input", s"$dir/state3", "--output", s"$dir/bad"))
    }
    assert(e.getMessage.contains("date mismatch"))
    // --force-date override
    DnsMag.run(spark, Array("aggregate", "--input", s"$dir/state1",
      "--input", s"$dir/state3", "--force-date", "2000-01-01",
      "--output", s"$dir/forced"))
    assert(spark.read.parquet(s"$dir/forced").count() > 0)
  }

  test(".dnsmag CBOR state through the CLI, view --json parity fields") {
    val dir = java.nio.file.Files.createTempDirectory("graft_job_cbor").toString
    val tsvPath = getClass.getResource("/test2.tsv").getPath
    // collect straight to a .dnsmag file, aggregate it with itself back to
    // parquet, then view --json — exercising both directions of the codec
    DnsMag.run(spark, Array("collect", "--input", tsvPath, "--tsv",
      "--date", "2000-01-01", "--output", s"$dir/state.dnsmag"))
    assert(new java.io.File(s"$dir/state.dnsmag").isFile)
    DnsMag.run(spark, Array("aggregate", "--input", s"$dir/state.dnsmag",
      "--input", s"$dir/state.dnsmag", "--output", s"$dir/merged"))
    // idempotent union: same clients twice -> same totals as once
    val json = graft.pipelines.DnsMagnitude.statsJson(
      spark.read.parquet(s"$dir/merged"))
    assert(json.contains("\"totalUniqueClients\":27"))
    assert(json.contains("\"totalQueryVolume\":400"))
    assert(json.contains("\"totalDomainCount\":7"))
    assert(json.contains("\"date\":\"2000-01-01\""))
    assert(json.contains("datasetStatistics"))
  }

  test("collect job fails on invalid records unless --skip-invalid") {
    val dir = java.nio.file.Files.createTempDirectory("graft_job_inv").toString
    val f = new java.io.File(dir, "dirty.csv")
    java.nio.file.Files.writeString(f.toPath,
      "192.168.1.1,com,5\n192.168.1.2,org,-3\n")
    val e = intercept[RuntimeException] {
      DnsMag.run(spark, Array("collect", "--input", f.toString,
        "--date", "2000-01-01", "--output", s"$dir/state"))
    }
    assert(e.getMessage.contains("invalid record"))
    // the failed collect must not leave committed output behind
    assert(!new java.io.File(s"$dir/state").exists())
    DnsMag.run(spark, Array("collect", "--input", f.toString, "--skip-invalid",
      "--date", "2000-01-01", "--output", s"$dir/state"))
    val st = spark.read.parquet(s"$dir/state")
    import org.apache.spark.sql.functions._
    assert(st.agg(sum(col("queries"))).collect()(0).getLong(0) === 5L)
  }
}
