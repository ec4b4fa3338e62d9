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
    // same contract as packGreedy: rows whose order or token value is NULL
    // cannot be packed and are excluded (the window sum would otherwise
    // skip them and leave a NULL pack_id); negative token counts are a
    // caller bug and fail fast rather than producing negative pack ids
    val base = df.filter(col(orderCol).isNotNull && col(tokenCol).isNotNull)
    val toks = when(col(tokenCol) < 0, raise_error(concat(
        lit(s"packConcat: negative $tokenCol "), col(tokenCol).cast("string"),
        lit(s" at $orderCol "), col(orderCol).cast("string"))))
      .otherwise(col(tokenCol))
    val wCum = Window.partitionBy(col(bucketCol))
      .orderBy(col(orderCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPack = base
      .withColumn("__cum", sum(toks).over(wCum))
      // running total BEFORE this doc = cum - tokens
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)) / budget).cast("long"))
    val wPos = Window.partitionBy(col(bucketCol), col("pack_id"))
      .orderBy(col(orderCol).asc_nulls_first)
    withPack
      .withColumn("pack_pos", row_number().over(wPos))
      .drop("__cum")
  }

  /**
   * TRUE greedy packing — close-on-overflow: within a bucket, documents in
   * `orderCol` order join the current pack until the next one would push
   * its total past `budget`, which opens a new pack (a document larger
   * than the budget is a singleton pack). These are the hard-cap semantics
   * trainers use when sequences must never be truncated: every pack total
   * is <= budget unless the pack is one oversized document, and pack ids
   * are dense per bucket.
   *
   * Each pack boundary depends on the previous one — a sequential fold no
   * window expression can compute — so the fold runs as ONE codegen'd pass
   * over each bucket's collected (order, tokens) pairs and joins back by
   * (bucket, order). Memory per task is bounded by the largest bucket (two
   * longs per doc): size buckets so a bucket's doc COUNT fits comfortably
   * in an executor — the same contract as any collect_list aggregation,
   * ENFORCED by `maxBucketRows` (default 8M ~ 128 MB of pairs; 0 = off):
   * an over-cap bucket fails fast with an actionable error instead of an
   * executor OOM hours into a run.
   * `orderCol` must be a unique integral id within its bucket (fail-fast
   * on other types — a silent cast-to-null would drop rows); rows whose
   * order or token value is NULL cannot be packed and are excluded, by
   * contract. Pre-existing pack_id/pack_pos columns are replaced.
   */
  def packGreedy(df: DataFrame, tokenCol: String, budget: Long,
                 bucketCol: String, orderCol: String = "doc_id",
                 maxBucketRows: Int = 8 << 20): DataFrame =
    foldPack(df, tokenCol, budget, bucketCol, orderCol, "packGreedy",
      a => graft.functions.GreedyPackIds(a, budget, maxBucketRows))

  /** Shared scaffolding of the fold-based packers: fail-fast integral
    * types, null exclusion, per-bucket collect + sequential-fold
    * expression, (bucket, order) equi-join back. The fold expression is
    * the only strategy-specific piece. */
  private def foldPack(df: DataFrame, tokenCol: String, budget: Long,
                       bucketCol: String, orderCol: String, name: String,
                       mkFold: org.apache.spark.sql.catalyst.expressions.Expression =>
                         org.apache.spark.sql.catalyst.expressions.Expression): DataFrame = {
    require(budget > 0, "budget must be positive")
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
    require(integral(df.schema(orderCol).dataType),
      s"$name orderCol '$orderCol' must be an integral id column, got " +
        s"${df.schema(orderCol).dataType.catalogString} (a lossy cast would drop rows)")
    require(integral(df.schema(tokenCol).dataType),
      s"$name tokenCol '$tokenCol' must be integral, got " +
        s"${df.schema(tokenCol).dataType.catalogString}")
    val base = df.drop("pack_id", "pack_pos")
      .filter(col(orderCol).isNotNull && col(tokenCol).isNotNull)
    val folded = base.groupBy(col(bucketCol))
      .agg(sort_array(collect_list(struct(
        col(orderCol).cast("long").as("o"),
        col(tokenCol).cast("long").as("tk")))).as("__a"))
      .select(col(bucketCol),
        explode(org.apache.spark.sql.graftshim.shims.column(
          mkFold(org.apache.spark.sql.graftshim.shims.expression(col("__a"))))).as("__p"))
      .select(col(bucketCol).as("__bucket"), col("__p.o").as("__o"),
        col("__p.pack_id").as("pack_id"), col("__p.pack_pos").as("pack_pos"))
    base.join(folded,
        col(bucketCol) <=> col("__bucket") && col(orderCol).cast("long") === col("__o"))
      .drop("__bucket", "__o")
  }

  /**
   * BEST-FIT-DECREASING packing — the padding-minimizing strategy for
   * training mixes where document order within a pack is free (each pack
   * is shuffled or attention-masked anyway): within a bucket, docs sorted
   * by (tokens desc, order asc) each join the FULLEST open pack that still
   * fits, else open a new pack (an oversized doc is a singleton). The BFD
   * guarantee the driver gate checks: a new pack opens only when the doc
   * fits in NO open pack, so EVERY pair of packs is unmergeable — their
   * totals sum past the budget — which bounds waste (at most one pack can
   * be under half full).
   *
   * Same distribution/memory/fail-fast contracts as [[packGreedy]]
   * (per-bucket codegen'd fold over collected pairs, `maxBucketRows`
   * guard, integral types, null exclusion); the fold is O(n log n) via a
   * residual-capacity tree. Deterministic and partition-invariant.
   */
  def packBestFit(df: DataFrame, tokenCol: String, budget: Long,
                  bucketCol: String, orderCol: String = "doc_id",
                  maxBucketRows: Int = 8 << 20): DataFrame =
    foldPack(df, tokenCol, budget, bucketCol, orderCol, "packBestFit",
      a => graft.functions.BestFitPackIds(a, budget, maxBucketRows))
}
