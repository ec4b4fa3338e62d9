package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Sequence packing for LLM pretraining: group whole documents into packs
 * whose token counts approach a fixed `budget` (the training sequence
 * length), so padding waste is bounded — the standard "greedy contiguous
 * packing" used by large-scale pretraining pipelines (documents
 * concatenated in order until the budget would overflow, then a new pack).
 *
 * Deterministic and distributed: packing runs independently inside each
 * bucket (`bucketCol`, e.g. `pmod(doc_id, 1024)` or a date partition), and
 * within a bucket documents pack in (orderCol) order via one window
 * cumulative sum — pack_id = which budget multiple the RUNNING total has
 * crossed. A document longer than the budget gets its own pack (never
 * split). Buckets bound the window's partition size, so no global sort and
 * no single-reducer funnel; at crawl scale pick buckets >> executors.
 *
 * Greedy-contiguous semantics (the shuffle-free convention): a pack may
 * exceed `budget` only by its LAST document's overflow when that document
 * is itself <= budget away from the boundary — i.e. packs are the maximal
 * prefix groups of the running sum, `pack_id = floor((cumsum - tokens) /
 * budget)`. Exactly reproducible in SQL, hence driver-gated 1:1.
 *
 * Returns the input plus (pack_id: long, pack_pos: int) — position of the
 * doc within its (bucket, pack). Pack ids are budget-window indices of the
 * concatenated stream: a document longer than the budget leaves the
 * windows it spans empty, so ids within a bucket are monotone but not
 * necessarily dense — `dense_rank` over (bucket, pack_id) densifies when a
 * trainer needs contiguous pack numbers.
 */
object Packing {

  def packGreedy(df: DataFrame, tokenCol: String, budget: Long,
                 bucketCol: String, orderCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val wCum = Window.partitionBy(col(bucketCol))
      .orderBy(col(orderCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPack = df
      .withColumn("__cum", sum(col(tokenCol)).over(wCum))
      // pack of the BUDGET WINDOW this doc STARTS in: cum - tokens = running
      // total before this doc
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)) / budget).cast("long"))
    val wPos = Window.partitionBy(col(bucketCol), col("pack_id"))
      .orderBy(col(orderCol).asc_nulls_first)
    withPack
      .withColumn("pack_pos", row_number().over(wPos))
      .drop("__cum")
  }
}
