package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Hand-computed as-of join semantics + the join-free plan contract. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 100L, "l-a"),
    (2L, "u1", 200L, "l-b"),
    (3L, "u1", 50L, "l-early"),  // before any right row
    (4L, "u2", 100L, "l-other"), // key with no right rows at all
    (5L, "u1", 150L, "l-tie")    // exactly equal to a right ts
  ).toDF("id", "key", "t", "payload")

  private def right = Seq(
    ("u1", 90L, "r-90"),
    ("u1", 150L, "r-150"),
    ("u1", 400L, "r-late")
  ).toDF("key", "t", "rv")

  test("asofJoin: latest right at-or-before each left row; inclusive ties; nulls") {
    val got = Joins.asofJoin(left, right, keys = Seq("key"),
        leftTs = "t", rightTs = "t", rightCols = Seq("rv"))
      .select($"id", $"rv").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("r-90"),   // 90 <= 100 < 150
      2L -> Some("r-150"),  // 150 <= 200 < 400
      3L -> None,           // nothing at or before 50
      4L -> None,           // no right rows for u2
      5L -> Some("r-150"))) // inclusive: right at the same ts wins
    // left columns pass through untouched
    val full = Joins.asofJoin(left, right, Seq("key"), "t", "t", Seq("rv"))
    assert(full.columns.toSeq === Seq("id", "key", "t", "payload", "rv"))
    assert(full.count() === 5)
  }

  test("asofJoin: multiple right payload columns carried together") {
    val r2 = right.withColumn("rv2", concat($"rv", lit("!")))
    val got = Joins.asofJoin(left, r2, Seq("key"), "t", "t", Seq("rv", "rv2"))
      .filter($"id" === 2L).select($"rv", $"rv2").as[(String, String)].head()
    assert(got === ("r-150", "r-150!"))
  }

  test("asofJoin: plan is join-free (one window, no BroadcastNestedLoopJoin)") {
    val plan = Joins.asofJoin(left, right, Seq("key"), "t", "t", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("asofJoin: partition invariance") {
    val a = Joins.asofJoin(left.repartition(1), right.repartition(1),
      Seq("key"), "t", "t", Seq("rv")).orderBy($"id").collect().toSeq
    val b = Joins.asofJoin(left.repartition(7), right.repartition(3),
      Seq("key"), "t", "t", Seq("rv")).orderBy($"id").collect().toSeq
    assert(a === b)
  }

  test("asofJoin: NULL payload on the matched row is returned, not an older value") {
    // right rows travel as one struct: a matched row whose payload IS null
    // must yield null (ignoreNulls skips absent ROWS, not null fields),
    // and multiple payload columns must never tear across right rows
    val r = Seq(
      ("u1", 100L, Some("old"), None: Option[String]),
      ("u1", 200L, None: Option[String], Some("new2"))
    ).toDF("key", "t", "rv", "rv2")
    val got = Joins.asofJoin(left, r, Seq("key"), "t", "t", Seq("rv", "rv2"))
      .filter($"id" === 2L) // left ts 200 matches the second right row
      .select($"rv", $"rv2").as[(Option[String], Option[String])].head()
    assert(got === ((None, Some("new2")))) // NOT ("old", "new2")
  }

  test("asofJoin: right rows with NULL timestamps are ignored") {
    val r = Seq(
      ("u1", Option.empty[Long], "bogus"),
      ("u1", Some(150L), "real")
    ).toDF("key", "t", "rv")
    val got = Joins.asofJoin(left, r, Seq("key"), "t", "t", Seq("rv"))
      .select($"id", $"rv").as[(Long, Option[String])].collect().toMap
    assert(got(3L) === None)        // ts 50: nothing at-or-before, not "bogus"
    assert(got(2L) === Some("real"))
  }

  test("asofJoin forward: earliest right at-or-after; inclusive; nulls") {
    val got = Joins.asofJoin(left, right, Seq("key"), "t", "t", Seq("rv"),
        direction = "forward")
      .select($"id", $"rv").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> Some("r-150"),  // 100 -> next is 150
      2L -> Some("r-late"), // 200 -> next is 400
      3L -> Some("r-90"),   // 50 -> next is 90
      4L -> None,           // u2 has no right rows
      5L -> Some("r-150"))) // inclusive at equal ts
    intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, Seq("key"), "t", "t", Seq("rv"),
        direction = "sideways")
    }
  }

  test("asofJoin: NULL left timestamps and NULL keys match nothing (both directions)") {
    val l = Seq(
      (1L, Some("u1"), Some(100L)),
      (2L, Some("u1"), None: Option[Long]), // NULL ts: no match either direction
      (3L, None: Option[String], Some(100L)) // NULL key: SQL semantics, no match
    ).toDF("id", "key", "t")
    val r = Seq(
      (Some("u1"), 10L, "x"),
      (None: Option[String], 10L, "null-key-payload") // must never be carried
    ).toDF("key", "t", "rv")
    for (dir <- Seq("backward", "forward")) {
      val got = Joins.asofJoin(l, r, Seq("key"), "t", "t", Seq("rv"), dir)
        .select($"id", $"rv").as[(Long, Option[String])].collect().toMap
      assert(got(2L) === None, s"NULL left ts must not match ($dir)")
      assert(got(3L) === None, s"NULL key must not match ($dir)")
      assert(got(1L) === (if (dir == "backward") Some("x") else None))
    }
  }

  test("asofJoin: column collision and empty args fail fast") {
    intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right.withColumnRenamed("rv", "payload"),
        Seq("key"), "t", "t", Seq("payload"))
    }
    intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, Seq.empty, "t", "t", Seq("rv"))
    }
    intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, Seq("key"), "t", "t", Seq.empty)
    }
  }

  test("latestPerKeyTs: deterministic arg-max dedup") {
    val dup = Seq(
      ("u1", 100L, 1L, "first"),
      ("u1", 100L, 9L, "winner"), // same (key, ts): larger tiebreak wins
      ("u1", 200L, 2L, "only")
    ).toDF("key", "t", "eid", "v")
    val got = Joins.latestPerKeyTs(dup, Seq("key"), "t", "eid", Seq("v"))
      .orderBy($"t").select($"v").as[String].collect().toSeq
    assert(got === Seq("winner", "only"))
  }
}
