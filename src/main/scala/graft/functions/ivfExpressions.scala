package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** nearest_centroids(vec) -> array<int> of the `nprobe` nearest centroid
  * indices by L2 distance. The centroid matrix lives in the expression
  * (plan-serialized, referenced from generated code via addReferenceObj) —
  * no lookup side-channel, no UDF. */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val idx =
      if (isFloat) NearestCentroids.nearestF(arr.toFloatArray(), centroids, nprobe)
      else NearestCentroids.nearestD(arr.toDoubleArray(), centroids, nprobe)
    new GenericArrayData(idx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val (conv, fn) = if (isFloat) ("toFloatArray", "nearestF") else ("toDoubleArray", "nearestD")
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.NearestCentroids.$fn($v.$conv(), $cRef, $nprobe))")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroids = copy(child = c)
}

object NearestCentroids {
  /** indices of the n nearest centroids by squared L2, ascending distance. */
  def nearestF(v: Array[Float], cents: Array[Array[Double]], n: Int): Array[Int] = {
    val d = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { d(i) = v(i); i += 1 }
    nearestD(d, cents, n)
  }

  def nearestD(v: Array[Double], cents: Array[Array[Double]], n: Int): Array[Int] = {
    val k = cents.length
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      val row = cents(c)
      var s = 0.0
      var i = 0
      val lim = math.min(v.length, row.length)
      while (i < lim) { val dd = v(i) - row(i); s += dd * dd; i += 1 }
      dist(c) = s
      c += 1
    }
    // partial selection of n smallest
    val out = new Array[Int](n)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < n) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < k) {
        if (!used(c) && dist(c) < bestD) { bestD = dist(c); best = c }
        c += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    out
  }
}
