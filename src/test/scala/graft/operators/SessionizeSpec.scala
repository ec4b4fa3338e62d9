package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hand-computed gap-session semantics. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("byGap: sessions split at gaps > timeout, not at exactly the timeout") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:10:00")), // 10 min: same session
      (3L, "u1", ts("2024-01-01 10:40:00")), // exactly 30 min: same (not >)
      (4L, "u1", ts("2024-01-01 11:40:01")), // 60:01: new session
      (5L, "u2", ts("2024-01-01 10:00:00")), // separate key
      (6L, "u2", ts("2024-01-02 10:00:00"))  // a day later: new session
    ).toDF("event_id", "key", "t")
    val got = Sessionize.byGap(ev, "key", "t", gapSeconds = 1800L)
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L, 6L -> 1L))
  }

  test("byGap: ties share a session; NULL key/ts rows drop; partition invariance") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:00:00")), // tie
      (3L, null.asInstanceOf[String], ts("2024-01-01 10:00:00")),
      (4L, "u1", null.asInstanceOf[java.sql.Timestamp])
    ).toDF("event_id", "key", "t")
    val got = Sessionize.byGap(ev, "key", "t", 60L)
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L))
    val a = Sessionize.byGap(ev.repartition(1), "key", "t", 60L)
      .orderBy($"event_id").collect().toSeq
    val b = Sessionize.byGap(ev.repartition(7), "key", "t", 60L)
      .orderBy($"event_id").collect().toSeq
    assert(a === b)
    intercept[IllegalArgumentException] { Sessionize.byGap(ev, "key", "t", 0L) }
  }

  test("sessionStats: start/end/count/duration per session") {
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:10:00")),
      (3L, "u1", ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "key", "t")
    val got = Sessionize.sessionStats(ev, "key", "t", 1800L)
      .orderBy($"session_idx")
      .select($"session_idx", $"n_events", $"duration_sec")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((0L, 2L, 600.0), (1L, 1L, 0.0)))
  }
}
