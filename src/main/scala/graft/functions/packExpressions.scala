package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** greedy_pack_ids(rows, budget) — the sequential close-on-overflow fold of
  * greedy sequence packing: `rows` is array<struct<o:long, tk:long>> sorted
  * by o; a new pack opens exactly when adding the next document would push
  * the running pack total past `budget` (a document larger than the budget
  * is a singleton pack). Returns array<struct<o:long, pack_id:long,
  * pack_pos:int>>. One tight loop per group — each boundary depends on the
  * previous one, which is why this is an expression over a collected
  * bucket, not a window. */
case class GreedyPackIds(child: Expression, budget: Long,
                         maxBucketRows: Int = 0)
    extends UnaryExpression {
  require(budget > 0, "budget must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"greedy_pack_ids requires array<struct<long, long>>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("o", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_pos", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "greedy_pack_ids"
  override def nullSafeEval(v: Any): Any =
    GreedyPackIds.pack(v.asInstanceOf[ArrayData], budget, maxBucketRows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.GreedyPackIds.pack($v, ${budget}L, $maxBucketRows)")
  override protected def withNewChildInternal(c: Expression): GreedyPackIds = copy(child = c)
}

object GreedyPackIds {
  def pack(rows: ArrayData, budget: Long, maxBucketRows: Int = 0): GenericArrayData = {
    val n = rows.numElements()
    // bucket sizing is a correctness-of-scale contract (each bucket is one
    // collected array): over-cap buckets fail fast with an actionable error
    // instead of an executor OOM hours into a run
    if (maxBucketRows > 0 && n > maxBucketRows)
      throw new IllegalArgumentException(
        s"greedy_pack_ids: bucket holds $n rows, over the maxBucketRows cap " +
          s"of $maxBucketRows — use a finer bucketCol (e.g. pmod(xxh3_64(id), " +
          "more buckets)) or raise the cap explicitly")
    val out = new Array[Any](n)
    var run = 0L
    var packId = 0L
    var pos = 0
    var i = 0
    while (i < n) {
      val row = rows.getStruct(i, 2)
      // defensive: a null order or token would silently read as 0 and could
      // alias a genuine id-0 row — the operator filters nulls, but a direct
      // caller must get an error, not corrupt packs
      if (row.isNullAt(0) || row.isNullAt(1))
        throw new IllegalArgumentException(
          "greedy_pack_ids: null order/token value cannot be packed")
      val o = row.getLong(0)
      val tk = row.getLong(1)
      if (tk < 0)
        throw new IllegalArgumentException(
          s"greedy_pack_ids: negative token count $tk at order $o")
      if (pos > 0 && run + tk > budget) {
        packId += 1
        run = 0L
        pos = 0
      }
      run += tk
      pos += 1
      out(i) = new GenericInternalRow(Array[Any](o, packId, pos))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** best_fit_pack_ids(rows, budget) — BEST-FIT-DECREASING bin packing of a
  * bucket: items sorted by (tokens desc, order asc) each go to the fullest
  * open pack that still fits (ties: smallest pack id), else open a new
  * pack; an item larger than the budget is a singleton pack. Used when
  * document ORDER inside a pack does not matter and padding waste does —
  * BFD's guarantee that a new pack opens only when the item fits nowhere
  * makes every PAIR of packs unmergeable (their totals sum past the
  * budget), the invariant the driver gate checks. Input/output shapes and
  * the `maxBucketRows` guard match [[GreedyPackIds]]; pack_pos is the
  * insertion order within the pack. O(n log n) via a residual-capacity
  * tree. */
case class BestFitPackIds(child: Expression, budget: Long,
                          maxBucketRows: Int = 0)
    extends UnaryExpression {
  require(budget > 0, "budget must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"best_fit_pack_ids requires array<struct<long, long>>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("o", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_pos", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "best_fit_pack_ids"
  override def nullSafeEval(v: Any): Any =
    BestFitPackIds.pack(v.asInstanceOf[ArrayData], budget, maxBucketRows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.BestFitPackIds.pack($v, ${budget}L, $maxBucketRows)")
  override protected def withNewChildInternal(c: Expression): BestFitPackIds = copy(child = c)
}

object BestFitPackIds {
  def pack(rows: ArrayData, budget: Long, maxBucketRows: Int = 0): GenericArrayData = {
    val n = rows.numElements()
    if (maxBucketRows > 0 && n > maxBucketRows)
      throw new IllegalArgumentException(
        s"best_fit_pack_ids: bucket holds $n rows, over the maxBucketRows cap " +
          s"of $maxBucketRows — use a finer bucketCol or raise the cap explicitly")
    val os = new Array[Long](n)
    val tks = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = rows.getStruct(i, 2)
      if (row.isNullAt(0) || row.isNullAt(1))
        throw new IllegalArgumentException(
          "best_fit_pack_ids: null order/token value cannot be packed")
      os(i) = row.getLong(0)
      tks(i) = row.getLong(1)
      if (tks(i) < 0)
        throw new IllegalArgumentException(
          s"best_fit_pack_ids: negative token count ${tks(i)} at order ${os(i)}")
      i += 1
    }
    // decreasing token order, ties by ascending order id — deterministic on
    // any input permutation (the input array is sorted by order id)
    val idx = Array.range(0, n).sortBy(j => (-tks(j), os(j)))
    // open packs keyed by (residual capacity, packId): best fit = smallest
    // residual >= tk (the fullest pack that still fits), ties smallest id
    val open = new java.util.TreeMap[(Long, Long), Long](
      Ordering.Tuple2[Long, Long])
    val packTotal = scala.collection.mutable.ArrayBuffer.empty[Long]
    val packCount = scala.collection.mutable.ArrayBuffer.empty[Int]
    val outPack = new Array[Long](n)
    val outPos = new Array[Int](n)
    idx.foreach { j =>
      val tk = tks(j)
      val fit = open.ceilingEntry((tk, Long.MinValue))
      val pid =
        if (fit != null) {
          val id = fit.getValue
          open.remove(fit.getKey)
          packTotal(id.toInt) += tk
          // exactly-full packs STAY open at residual 0: a zero-token item
          // best-fits into one (otherwise it would open a zero-total pack,
          // and a (full, zero) pair sums to exactly the budget — breaking
          // the pairwise-unmergeability guarantee the gate checks)
          if (budget - packTotal(id.toInt) >= 0)
            open.put((budget - packTotal(id.toInt), id), id)
          id
        } else {
          val id = packTotal.length.toLong
          packTotal += tk
          packCount += 0
          if (budget - tk >= 0) open.put((budget - tk, id), id)
          id
        }
      packCount(pid.toInt) += 1
      outPack(j) = pid
      outPos(j) = packCount(pid.toInt)
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = new GenericInternalRow(Array[Any](os(i), outPack(i), outPos(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
