package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained OPQ model: an orthonormal rotation applied before product
  * quantization. `rt` is R^T row-major (the matrix actually applied to
  * vectors: y = R^T x). Top-level so generated code can name the type. */
final case class OpqModel(rt: Array[Array[Double]], pq: PqModel) extends Serializable {
  def dims: Int = pq.dims
}

/**
 * Optimized Product Quantization (Ge et al., "Optimized Product
 * Quantization for Approximate Nearest Neighbor Search", CVPR 2013) — the
 * non-parametric variant: alternate (a) Lloyd updates of the per-sub-space
 * codebooks in the rotated space with (b) the orthogonal Procrustes
 * rotation update R = U V^T from the SVD of X^T X̂. OPQ removes PQ's
 * axis-alignment weakness: when variance concentrates in a few correlated
 * dimensions, independent sub-space quantizers waste their codebooks; the
 * learned rotation redistributes variance so every sub-space carries
 * signal.
 *
 * Scale shape: training is driver-side over the SAME deterministic bounded
 * sample as [[Pq.train]] (the sample the distributed trainer caches fits in
 * driver memory by construction — 128k x 64 doubles = 67 MB; standard
 * practice trains OPQ in-memory on <= ~1M vectors). Everything corpus-sized
 * stays distributed and codegen'd: rotation + encoding is one expression
 * pipeline per row ([[graft.functions.RotateVec]] -> PqEncode), search is
 * the same plan-embedded ADC scan as PQ — queries rotate driver-side, the
 * code table is scanned once, nothing shuffles before the two-phase top-k.
 */
object Opq {

  /** Train rotation + codebooks on the deterministic hashed-order sample.
    * Seeds and tie-breaking match [[Pq.train]] (identity rotation, ks
    * smallest-hash rows), so opqIters = 0 reproduces plain PQ exactly. */
  def train(corpus: DataFrame, dims: Int, m: Int = 8, ks: Int = 16,
            iters: Int = 3, opqIters: Int = 5,
            idCol: String = "vec_id", vecCol: String = "embedding",
            sampleSize: Int = Ivf.defaultTrainSample): OpqModel = {
    require(dims % m == 0, s"dims $dims must divide into m=$m sub-spaces")
    require(sampleSize > 0, "OPQ training needs a bounded sample (driver-side SVD)")
    val sub = dims / m
    // ONE distributed top-n pass; the sample is driver-bounded by contract
    val rows = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(col("vec").isNotNull && size(col("vec")) === dims)
      .withColumn("__h", graft.functions.GraftFunctions.xxh3_64(col("id").cast("string")))
      .orderBy(col("__h")).limit(sampleSize)
      .select(col("vec"))
      .collect()
    val x: Array[Array[Double]] = rows.map(_.getAs[scala.collection.Seq[Any]]("vec").map {
      case f: Float => f.toDouble
      case d: Double => d
    }.toArray)
    val n = x.length
    require(n > 0, "OPQ training sample is empty")

    // seeds: sub-vectors of the ks smallest-hash rows (identity rotation)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => x.take(ks).map(_.slice(j * sub, (j + 1) * sub)))
    var rt: Array[Array[Double]] = Array.tabulate(dims, dims)((i, j) => if (i == j) 1.0 else 0.0)

    def rotated(): Array[Array[Double]] = x.map(v => graft.functions.RotateVec.apply(v, rt))

    // one Lloyd step per sub-space in the rotated space (empty clusters
    // keep their previous centroid, matching Pq.train)
    def lloydStep(y: Array[Array[Double]]): Unit = {
      val model = PqModel(dims, m, ks, books)
      val codes = y.map(v => graft.functions.PqEncode.encode(v, model))
      val next = books.map(_.map(_.clone()))
      var j = 0
      while (j < m) {
        val sums = Array.ofDim[Double](ks, sub)
        val cnts = new Array[Long](ks)
        var i = 0
        while (i < n) {
          val c = codes(i)(j)
          val yi = y(i)
          var d = 0
          while (d < sub) { sums(c)(d) += yi(j * sub + d); d += 1 }
          cnts(c) += 1
          i += 1
        }
        var c = 0
        while (c < ks) {
          if (cnts(c) > 0) {
            var d = 0
            while (d < sub) { next(j)(c)(d) = sums(c)(d) / cnts(c); d += 1 }
          }
          c += 1
        }
        j += 1
      }
      books = next
    }

    // phase 1: `iters` Lloyd steps at R = I — exactly Pq.train's refinement
    var it = 0
    while (it < iters) { lloydStep(rotated()); it += 1 }

    // phase 2: `opqIters` rounds of {Procrustes R update from the current
    // reconstruction, then a Lloyd step in the NEW rotated space} — ends
    // with codebooks consistent with the final rotation
    var ot = 0
    while (ot < opqIters) {
      val y = rotated()
      val model = PqModel(dims, m, ks, books)
      val codes = y.map(v => graft.functions.PqEncode.encode(v, model))
      // M = X^T Yhat = sum_i x_i yhat_i^T (d x d); R = U V^T maximizes
      // tr(R^T M) over orthonormal R (orthogonal Procrustes)
      val mMat = breeze.linalg.DenseMatrix.zeros[Double](dims, dims)
      var i = 0
      while (i < n) {
        val xi = x(i)
        val ci = codes(i)
        var j = 0
        while (j < m) {
          val cent = books(j)(ci(j))
          var d = 0
          while (d < sub) {
            val yv = cent(d)
            if (yv != 0.0) {
              val c2 = j * sub + d
              var r = 0
              while (r < dims) { mMat(r, c2) += xi(r) * yv; r += 1 }
            }
            d += 1
          }
          j += 1
        }
        i += 1
      }
      val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(mMat)
      val rMat = u * vt
      rt = Array.tabulate(dims, dims)((r, c) => rMat(c, r)) // rt = R^T
      lloydStep(rotated())
      ot += 1
    }
    OpqModel(rt, PqModel(dims, m, ks, books))
  }

  /** Rotated vector column (array<double>), R^T x via a codegen'd loop. */
  def rotateVec(vec: Column, model: OpqModel): Column =
    org.apache.spark.sql.graftshim.shims.column(
      graft.functions.RotateVec(
        org.apache.spark.sql.graftshim.shims.expression(vec), model.rt))

  /** Code column: rotate then product-quantize, one expression pipeline. */
  def encode(vec: Column, model: OpqModel): Column =
    Pq.encode(rotateVec(vec, model), model.pq)

  /** ADC top-k in the rotated space: queries rotate driver-side (inside the
    * plan, via the same expression), the code-table scan and two-phase
    * top-k are exactly [[Pq.adcTopK]]. Scores are approximate cosines — the
    * rotation is orthonormal, so angles are preserved. */
  def adcTopK(codes: DataFrame, queries: DataFrame, k: Int, model: OpqModel,
              idCol: String = "vec_id", vecCol: String = "embedding",
              codeCol: String = "pq_code", excludeSelf: Boolean = true): DataFrame = {
    val rotated = queries.select(col(idCol),
      rotateVec(col(vecCol), model).as(vecCol))
    Pq.adcTopK(codes, rotated, k, model.pq, idCol, vecCol, codeCol, excludeSelf)
  }

  /** The billion-scale composition with a learned rotation — OPQ-IVFADC:
    * everything (coarse quantizer, codes, queries) lives in the rotated
    * space, so the probe-and-ADC-scan plan is exactly [[Ivf.adcTopK]] with
    * one extra codegen'd mat-vec per row. `centroids` must be trained on
    * ROTATED vectors (see the test for the one-liner via Ivf.train over
    * [[rotateVec]]); angles — and therefore lists and rankings — are
    * preserved by orthonormality. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 centroids: Array[Array[Double]], model: OpqModel, nprobe: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 excludeSelf: Boolean = true): DataFrame = {
    def rotated(df: DataFrame) =
      df.select(col(idCol), rotateVec(col(vecCol), model).as(vecCol))
    Ivf.adcTopK(rotated(corpus), rotated(queries), k, centroids, model.pq, nprobe,
      idCol, vecCol, excludeSelf)
  }
}
