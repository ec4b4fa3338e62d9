package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** pq_encode(vec) -> array<int> of m sub-space code ids. The codebooks are
  * plan-embedded (addReferenceObj) like NearestCentroids. */
case class PqEncode(child: Expression, model: graft.operators.PqModel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val d = if (isFloat) {
      val f = arr.toFloatArray()
      val t = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { t(i) = f(i); i += 1 }
      t
    } else arr.toDoubleArray()
    new GenericArrayData(PqEncode.encode(d, model))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pqModel", model, "graft.operators.PqModel")
    val conv = if (isFloat) "toFloatArray" else "toDoubleArray"
    val fn = if (isFloat) "encodeF" else "encode"
    defineCodeGen(ctx, ev, v =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.PqEncode.$fn($v.$conv(), $mRef))")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

object PqEncode {
  def encodeF(v: Array[Float], model: graft.operators.PqModel): Array[Int] = {
    val d = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { d(i) = v(i); i += 1 }
    encode(d, model)
  }
  def encode(v: Array[Double], model: graft.operators.PqModel): Array[Int] = {
    val sub = model.subDims
    val out = new Array[Int](model.m)
    var j = 0
    while (j < model.m) {
      val book = model.codebooks(j)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var s = 0.0
        var i = 0
        val lim = math.min(sub, cent.length)
        while (i < lim) {
          val base = j * sub + i
          val x = if (base < v.length) v(base) else 0.0
          val dd = x - cent(i)
          s += dd * dd
          i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    out
  }
}

/**
 * pq_adc_score(code, queryIdx) -> approximate cosine via asymmetric
 * distance: sum of per-sub-space lookup-table entries (dot(q_j, centroid)
 * already divided by |q|), normalized by the reconstruction's norm
 * (per-(subspace, code) squared norms summed under a sqrt). Tables are
 * plan-embedded; scoring is m array reads per row.
 */
case class PqAdcScore(left: Expression, right: Expression,
                      luts: Array[Array[Array[Double]]],
                      normSq: Array[Array[Double]])
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires (array<int>, int), got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"
  override def nullSafeEval(code: Any, qi: Any): Any =
    PqAdcScore.score(code.asInstanceOf[ArrayData].toIntArray(),
      luts(qi.asInstanceOf[Int]), normSq)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("pqLuts", luts, "double[][][]")
    val nRef = ctx.addReferenceObj("pqNorms", normSq, "double[][]")
    defineCodeGen(ctx, ev, (c, qi) =>
      s"graft.functions.PqAdcScore.score($c.toIntArray(), $lRef[$qi], $nRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
}

object PqAdcScore {
  def score(code: Array[Int], lut: Array[Array[Double]],
            normSq: Array[Array[Double]]): Double = {
    var dot = 0.0
    var n2 = 0.0
    var j = 0
    while (j < code.length && j < lut.length) {
      val c = code(j)
      dot += lut(j)(c)
      n2 += normSq(j)(c)
      j += 1
    }
    if (n2 <= 0) 0.0 else dot / math.sqrt(n2)
  }
}
