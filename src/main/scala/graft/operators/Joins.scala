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
    val bloom = keys.agg(bloom_build(xxh3_64(keyCol.cast("string"))).as("__bf"))
    val prefiltered = large
      .crossJoin(broadcast(bloom))
      .filter(bloom_contains(col("__bf"), xxh3_64(largeKey.cast("string"))))
      .drop("__bf")
    prefiltered.join(keys.select(keyCol.as("__k")).distinct(),
      largeKey === col("__k"), "left_semi")
  }
}
