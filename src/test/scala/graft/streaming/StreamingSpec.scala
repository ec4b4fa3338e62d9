package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends AnyFunSuite {

  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("streaming windowed HLL agg matches the batch equivalent") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // stream the same data in 3 file chunks
    events.repartition(3).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)

    val agg = StreamingSketch.windowedHll(stream, "ts", "event_type", "user_id",
      windowLen = "1 day", watermark = "0 seconds")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_hll")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.sql("SELECT * FROM win_hll").collect()
      .map(r => (r.getAs[Any]("win_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("est_entities"), r.getAs[Long]("n")))
      .sortBy(_.toString)

    val batch = graft.functions.GraftFunctions.hll_est _
    import graft.functions.GraftFunctions.{hll_build, xxh3_64, hll_est}
    val expected = events
      .withColumn("ts", $"ts".cast("timestamp"))
      .groupBy(window($"ts", "1 day"), $"event_type")
      .agg(hll_build(xxh3_64($"user_id".cast("string"))).as("hll"), count(lit(1)).as("n"))
      .select($"window.start".as("win_start"), $"event_type",
        hll_est($"hll").as("est_entities"), $"n")
      .collect()
      .map(r => (r.getAs[Any]("win_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("est_entities"), r.getAs[Long]("n")))
      .sortBy(_.toString)

    assert(streamed.nonEmpty)
    assert(streamed === expected)
  }

  test("stateful sessionization (flatMapGroupsWithState) closes gap-split sessions") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(
      EventIn(1L, new java.sql.Timestamp(base)),
      EventIn(1L, new java.sql.Timestamp(base + 60000)),       // same session
      EventIn(1L, new java.sql.Timestamp(base + 10000000)),    // new session
      EventIn(2L, new java.sql.Timestamp(base)))
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    rows.toDS().write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(rows.toDS().schema).parquet(srcDir).as[EventIn]
    val sessions = StreamingSketch.sessionize(stream, gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // the closed session for user 1 (2 events) must be emitted; the
    // still-open sessions remain in state
    val closed = spark.sql("SELECT * FROM sessions").as[SessionOut].collect()
    assert(closed.toSeq === Seq(SessionOut(1L, 2, base, base + 60000)))
  }
}
