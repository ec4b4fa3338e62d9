package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * Sketch-accelerated joins. The classic 100 TB move: before shuffling the
 * huge fact side into a semi-join, kill the non-matching rows with a
 * broadcast Bloom filter built from the (much smaller) key side — no false
 * negatives, so following up with the real equi-join keeps results exact
 * while the shuffle only carries the ~FPP-inflated survivor set.
 */
object Joins {

  /**
   * Exact left-semi join accelerated by a Bloom prefilter.
   *
   * Plan: one aggregation builds the Bloom over `keys` (one row, broadcast
   * by the cross join), the big side filters by `bloom_contains` BEFORE the
   * shuffle, then the ordinary left-semi equi-join removes the Bloom's
   * false positives. Result is bit-identical to a plain semi join; the
   * shuffle volume drops from |large| to |matches| + FPP*|large|.
   */
  def bloomSemiJoin(large: DataFrame, largeKey: Column,
                    keys: DataFrame, keyCol: Column): DataFrame = {
    // materialize the ONE sketch row driver-side and embed the PARSED
    // filter in the predicate expression (a bytes column would be
    // re-deserialized per probed row — measured slower than the join it
    // accelerates); the plan ships the filter once per executor
    val bytes = keys.agg(bloom_build(xxh3_64(keyCol.cast("string"))))
      .collect()(0).getAs[Array[Byte]](0)
    val prefiltered = large.filter(
      org.apache.spark.sql.graftshim.shims.column(
        graft.functions.BloomContainsLit(
          org.apache.spark.sql.graftshim.shims.expression(
            xxh3_64(largeKey.cast("string"))), bytes)))
    prefiltered.join(keys.select(keyCol.as("__k")).distinct(),
      largeKey === col("__k"), "left_semi")
  }

  /**
   * As-of join: for every left row, attach the latest right row with
   * `right.ts <= left.ts` on the same key (the temporal point-lookup —
   * "state as of this event" — that range joins answer with a quadratic
   * candidate explosion). `direction = "forward"` flips the rule to the
   * EARLIEST right row with `right.ts >= left.ts` ("next event after").
   *
   * Plan shape: NO join at all. Both sides are tagged and unioned, then ONE
   * shuffle+sort per key (`ts` ascending, right-before-left on ties so
   * `<=` is inclusive) lets a running `last(_, ignoreNulls = true)` window
   * carry each right row's payload forward to the left rows that follow
   * it. Cost is a single sort of |L|+|R| — the same shuffle a groupBy
   * would pay — independent of how many right rows precede each left row,
   * so a key with millions of updates costs the same as one with two.
   * This is the standard large-scale as-of strategy (union + ordered
   * carry-forward) rather than an inequality join, which Spark would plan
   * as a broadcast-nested-loop.
   *
   * Contract: `right` must be unique per (keys, rightTs); with duplicate
   * right timestamps the carried payload depends on the sort's tie order —
   * pre-aggregate with a deterministic rule first (see `latestPerKeyTs`).
   * Right columns are attached under their own names; left columns pass
   * through unchanged.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Seq[String],
               direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got $direction")
    require(keys.nonEmpty, "asofJoin: at least one key column")
    require(rightCols.nonEmpty, "asofJoin: at least one right payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(rightCols.contains),
      s"asofJoin: right columns ${rightCols.filter(leftCols.contains)} collide with left")

    // tagged union: side 0 = right (sorts first on ts ties -> inclusive <=).
    // The right payload travels as ONE struct (non-null for every right
    // row, even when its fields are null) so last(ignoreNulls) means
    // "latest right ROW", never "latest non-null field": a matched row
    // with a NULL payload column yields that NULL, and multiple payload
    // columns can never tear across different right rows. Right rows with
    // a NULL timestamp are dropped — NULL never satisfies ts <= left.ts
    // (they would otherwise sort nulls-first and leak into every left row).
    // NULL join keys match nothing (SQL join semantics — the NULL-key
    // left rows still pass through, with NULL payload): right rows with
    // any NULL key are dropped, so a NULL-key window partition contains
    // only left rows and carries nothing.
    val rightKeysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val rightTagged = right.filter(col(rightTs).isNotNull && rightKeysNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__payload"): _*)
    val leftTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rightTagged.schema("__payload").dataType).as("__payload"): _*)

    // backward: latest right at-or-before (ts asc); forward: EARLIEST
    // right at-or-after (ts desc — the carry walks back from the future).
    // Either way right sorts before left on ties, so the bound is
    // inclusive; NULLS FIRST in BOTH directions so a left row with a NULL
    // timestamp scans before every right row and stays unmatched (desc's
    // default nulls-LAST would hand it the running payload).
    val tsOrder =
      if (direction == "backward") col("__ts").asc_nulls_first
      else col("__ts").desc_nulls_first
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val carried = rightTagged.unionByName(leftTagged)
      .select(col("*"),
        last(col("__payload"), ignoreNulls = true).over(w).as("__asof"))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Deterministic right-side dedup for `asofJoin`: one row per
    * (keys, tsCol), keeping the row that maximizes `tiebreak` (e.g. an
    * event id) — a single struct-max aggregation, no window rank. */
  def latestPerKeyTs(df: DataFrame, keys: Seq[String], tsCol: String,
                     tiebreak: String, payload: Seq[String]): DataFrame = {
    val packed = struct((tiebreak +: payload).map(col): _*)
    df.groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(packed).as("__best"))
      .select((keys :+ tsCol).map(col) ++
        payload.map(c => col(s"__best.$c").as(c)): _*)
  }
}
