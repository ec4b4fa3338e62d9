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
}
