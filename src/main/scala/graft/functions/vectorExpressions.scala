package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector expressions over array<float>/array<double> columns, codegen'd
  * into graft.core.vector.VectorOps tight loops (Spark's zip_with/aggregate
  * higher-order functions are CodegenFallback and allocate per element —
  * measured 20x slower on the candidate-pair cosine path). */

private object VecType {
  def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
}

/** cosine_sim(a, b) -> double. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (VecType.elem(left.dataType), VecType.elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float> or two array<double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  private def isFloat = VecType.elem(left.dataType).contains(FloatType)
  override def nullSafeEval(a: Any, b: Any): Any = {
    if (isFloat)
      graft.core.vector.VectorOps.cosineF(
        a.asInstanceOf[ArrayData].toFloatArray(), b.asInstanceOf[ArrayData].toFloatArray())
    else
      graft.core.vector.VectorOps.cosineD(
        a.asInstanceOf[ArrayData].toDoubleArray(), b.asInstanceOf[ArrayData].toDoubleArray())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (conv, fn) = if (isFloat) ("toFloatArray", "cosineF") else ("toDoubleArray", "cosineD")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.core.vector.VectorOps.$fn($a.$conv(), $b.$conv())")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** lsh_sig(vec) -> long sign-sketch under deterministic hyperplane table. */
case class LshSig(child: Expression, planes: Int, table: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecType.elem(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lsh_sig requires array<float|double>, got ${child.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sig"
  private def isFloat = VecType.elem(child.dataType).contains(FloatType)
  override def nullSafeEval(v: Any): Any = {
    if (isFloat)
      graft.core.vector.VectorOps.lshSigF(v.asInstanceOf[ArrayData].toFloatArray(), planes, table)
    else
      graft.core.vector.VectorOps.lshSigD(v.asInstanceOf[ArrayData].toDoubleArray(), planes, table)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (conv, fn) = if (isFloat) ("toFloatArray", "lshSigF") else ("toDoubleArray", "lshSigD")
    defineCodeGen(ctx, ev, v =>
      s"graft.core.vector.VectorOps.$fn($v.$conv(), $planes, $table)")
  }
  override protected def withNewChildInternal(c: Expression): LshSig = copy(child = c)
}

/** sorted_intersect_count(a, b) -> |a ∩ b| for two SORTED array<long>
  * columns, via a single linear merge (no per-element boxing, no hash set).
  * Used by the set-similarity verifiers: candidate pairs carry two sorted
  * 64-bit shingle-hash arrays; the intersect count is the exact overlap. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), ArrayType(LongType, containsNull = false))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData].toLongArray(), b.asInstanceOf[ArrayData].toLongArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a.toLongArray(), $b.toLongArray())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

object SortedIntersectCount {
  def count(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var n = 0L
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }
}

/** centroid_cos(vec, cluster) -> cosine(vec, centroids[cluster]). The
  * centroid matrix is plan-embedded (addReferenceObj), same pattern as
  * NearestCentroids — used by the exact cluster-pruned similarity join to
  * compute per-block angular radii in the assignment pass. */
case class CentroidCos(left: Expression, right: Expression,
                       centroids: Array[Array[Double]]) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (VecType.elem(left.dataType), right.dataType) match {
      case (Some(_), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"centroid_cos requires (array<float|double>, int), got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "centroid_cos"
  private def isFloat = VecType.elem(left.dataType).contains(FloatType)
  override def nullSafeEval(v: Any, c: Any): Any = {
    val cent = centroids(c.asInstanceOf[Int])
    if (isFloat)
      graft.core.vector.VectorOps.cosineFD(v.asInstanceOf[ArrayData].toFloatArray(), cent)
    else
      graft.core.vector.VectorOps.cosineD(v.asInstanceOf[ArrayData].toDoubleArray(), cent)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val (conv, fn) = if (isFloat) ("toFloatArray", "cosineFD") else ("toDoubleArray", "cosineD")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.core.vector.VectorOps.$fn($v.$conv(), $cRef[$c])")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidCos =
    copy(left = l, right = r)
}

/** bloom_contains against a plan-embedded, pre-parsed filter — for
  * broadcast-style prefilters. Putting sketch BYTES in a column makes the
  * estimator re-parse the filter per row (measured: a 128 KiB Bloom parsed
  * 600k times cost more than the join it was accelerating); here the filter
  * deserializes once per executor via addReferenceObj. */
case class BloomContainsLit(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  @transient private lazy val filter = graft.core.sketch.BloomFilter.fromBytes(filterBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_lit requires LONG hash input, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_lit"
  override def nullSafeEval(h: Any): Any = filter.mightContain(h.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      "graft.core.sketch.BloomFilter")
    defineCodeGen(ctx, ev, h => s"$ref.mightContain($h)")
  }
  override protected def withNewChildInternal(c: Expression): BloomContainsLit = copy(child = c)
}

/** hll_union(a, b) -> unioned AK-spec sketch bytes (scalar two-sketch
  * composition; the aggregate form is hll_merge). */
case class HllUnion(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_union"
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.core.sketch.SketchOps.hllUnion(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.sketch.SketchOps.hllUnion($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HllUnion =
    copy(left = l, right = r)
}

/** kll_splits(sketch, n) -> n-1 equi-height bucket boundaries — the
  * sketch-driven range-partitioning primitive: compute split points from a
  * KLL built in one pass, then range-partition 100 TB by them (what
  * RangePartitioner does by sampling, but mergeable and exact-one-pass). */
case class KllSplits(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_splits"
  override def nullSafeEval(sketch: Any, n: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val buckets = n.asInstanceOf[Int]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.core.sketch.SketchOps.kllSplits(bytes, buckets))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.core.sketch.SketchOps.kllSplits($s, $n))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllSplits =
    copy(left = l, right = r)
}

/** l2ap_prefix(keys, weights) -> array<struct<h:long, w:double, nx:double>>
  * — the L2AP prefix (Anastasiu & Karypis 2014): features in global
  * rarest-first order are kept while the running SUFFIX norm (of the
  * unit-normalized weight vector) stays >= t. Each kept feature carries its
  * own weight `w` and the suffix norm AFTER it, `nx = ||x[i+1..]||`:
  * at the globally smallest SHARED feature of a pair (position i of a, j of
  * b) every other shared feature ranks after both, so
  * cos(a,b) <= w_a[i]*w_b[j] + nx_a[i]*nx_b[j] (Cauchy-Schwarz on the
  * suffixes) — the positional bound, strictly tighter than the plain
  * suffix-norm product sqrt(w_a^2+nx_a^2)*sqrt(w_b^2+nx_b^2) (2-D
  * Cauchy-Schwarz), and exact: the first-shared-feature row of a
  * qualifying pair always passes, so completeness is preserved while
  * non-first rows that fail only shed duplicate candidates. */
case class L2apPrefix(left: Expression, right: Expression, t: Double)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false),
      ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h", LongType, nullable = false),
      StructField("w", DoubleType, nullable = false),
      StructField("nx", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "l2ap_prefix"
  override def nullSafeEval(k: Any, w: Any): Any =
    L2apPrefix.prefix(k.asInstanceOf[ArrayData].toLongArray(),
      w.asInstanceOf[ArrayData].toDoubleArray(), t)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, w) =>
      s"graft.functions.L2apPrefix.prefix($k.toLongArray(), $w.toDoubleArray(), $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2apPrefix =
    copy(left = l, right = r)
}

object L2apPrefix {
  def prefix(keys: Array[Long], w: Array[Double],
             t: Double): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = math.min(keys.length, w.length)
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var s = 0.0 // sum of squares BEFORE position i
    var i = 0
    var go = true
    while (go && i < n) {
      val suffixSq = 1.0 - s
      if (suffixSq < t * t) go = false
      else {
        val nx = math.sqrt(math.max(0.0, suffixSq - w(i) * w(i)))
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](keys(i), w(i), nx))
        s += w(i) * w(i)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** sorted_weighted_dot(ka, wa, kb, wb) -> dot product of two sparse vectors
  * given as key-sorted parallel arrays — the verification kernel of the
  * exact sparse cosine join (one linear merge per candidate pair, no
  * per-element allocation). */
case class SortedWeightedDot(first: Expression, second: Expression,
                             third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false),
      ArrayType(DoubleType, containsNull = false),
      ArrayType(LongType, containsNull = false),
      ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_weighted_dot"
  override def nullSafeEval(ka: Any, wa: Any, kb: Any, wb: Any): Any =
    SortedWeightedDot.dot(
      ka.asInstanceOf[ArrayData].toLongArray(), wa.asInstanceOf[ArrayData].toDoubleArray(),
      kb.asInstanceOf[ArrayData].toLongArray(), wb.asInstanceOf[ArrayData].toDoubleArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ka, wa, kb, wb) =>
      s"graft.functions.SortedWeightedDot.dot($ka.toLongArray(), $wa.toDoubleArray(), " +
      s"$kb.toLongArray(), $wb.toDoubleArray())")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression, d: Expression): SortedWeightedDot =
    copy(first = a, second = b, third = c, fourth = d)
}

object SortedWeightedDot {
  def dot(ka: Array[Long], wa: Array[Double],
          kb: Array[Long], wb: Array[Double]): Double = {
    var i = 0; var j = 0; var s = 0.0
    val na = math.min(ka.length, wa.length)
    val nb = math.min(kb.length, wb.length)
    while (i < na && j < nb) {
      if (ka(i) < kb(j)) i += 1
      else if (ka(i) > kb(j)) j += 1
      else { s += wa(i) * wb(j); i += 1; j += 1 }
    }
    s
  }
}

/** rotate_vec(vec) -> R^T * vec as array<double> — the OPQ rotation applied
  * per row (Ge et al. 2013). The d x d orthonormal matrix is plan-embedded
  * (addReferenceObj, row-major), the product a codegen'd tight loop; rows
  * shorter than d are zero-padded, longer ones truncated. */
case class RotateVec(child: Expression, rt: Array[Array[Double]])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rotate_vec requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rotate_vec"
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val d =
      if (isFloat) { val f = arr.toFloatArray(); Array.tabulate(f.length)(i => f(i).toDouble) }
      else arr.toDoubleArray()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(RotateVec.apply(d, rt))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("opqRt", rt, "double[][]")
    val (conv, fn) = if (isFloat) ("toFloatArray", "applyF") else ("toDoubleArray", "apply")
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.RotateVec.$fn($v.$conv(), $rRef))")
  }
  override protected def withNewChildInternal(c: Expression): RotateVec = copy(child = c)
}

object RotateVec {
  def applyF(v: Array[Float], rt: Array[Array[Double]]): Array[Double] = {
    val d = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { d(i) = v(i); i += 1 }
    apply(d, rt)
  }
  /** out[j] = sum_i rt[j][i] * v[i] (rt = R^T, row-major). */
  def apply(v: Array[Double], rt: Array[Array[Double]]): Array[Double] = {
    val dims = rt.length
    val out = new Array[Double](dims)
    var j = 0
    while (j < dims) {
      val row = rt(j)
      var s = 0.0
      var i = 0
      val lim = math.min(row.length, v.length)
      while (i < lim) { s += row(i) * v(i); i += 1 }
      out(j) = s
      j += 1
    }
    out
  }
}
