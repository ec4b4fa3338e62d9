package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Sequence-pack assignment for LLM pretraining, CONCAT-AND-CHUNK
 * convention: within each bucket, documents are conceptually concatenated
 * in `orderCol` order and the stream is cut into `budget`-token windows;
 * every document is assigned to the window its FIRST token falls in
 * (`pack_id = floor(running_total_before_doc / budget)`). This is the
 * whole-document analogue of GPT-style concat-then-chunk: documents are
 * never split, window boundaries are budget-aligned, and the LAST document
 * of a pack may straddle into the next window (a pack can therefore exceed
 * the budget by up to its last document's length — trainers that need hard
 * caps truncate that tail; a document longer than the budget spans several
 * windows, which stay empty, so ids are monotone per bucket but not dense;
 * `dense_rank` over (bucket, pack_id) densifies them).
 *
 * True "close the pack when it would overflow" greedy packing is a
 * sequential fold (each boundary depends on the previous one) and cannot
 * be one window expression; the start-window assignment is the standard
 * shuffle-free approximation and is exactly SQL-reproducible, hence
 * driver-gated 1:1.
 *
 * Deterministic and distributed: packing runs independently inside each
 * bucket (`bucketCol`, e.g. `pmod(xxh3_64(id), 1024)` or a date
 * partition), one window cumulative sum per bucket — buckets bound the
 * window partition size, so no global sort and no single-reducer funnel.
 * Contract (as in [[Sampling]]): `orderCol` must uniquely identify rows
 * within a bucket — ties would make the running sum order, and therefore
 * pack assignment, partition-dependent.
 *
 * Returns the input plus (pack_id: long, pack_pos: int) — position of the
 * doc within its (bucket, pack).
 */
object Packing {

  def packConcat(df: DataFrame, tokenCol: String, budget: Long,
                 bucketCol: String, orderCol: String = "doc_id"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val wCum = Window.partitionBy(col(bucketCol))
      .orderBy(col(orderCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPack = df
      .withColumn("__cum", sum(col(tokenCol)).over(wCum))
      // running total BEFORE this doc = cum - tokens
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)) / budget).cast("long"))
    val wPos = Window.partitionBy(col(bucketCol), col("pack_id"))
      .orderBy(col(orderCol).asc_nulls_first)
    withPack
      .withColumn("pack_pos", row_number().over(wPos))
      .drop("__cum")
  }
}
