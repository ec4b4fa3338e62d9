package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product quantization (Jégou et al., "Product quantization for nearest
 * neighbor search") — the memory-scale ANN path: vectors compress to `m`
 * byte-sized codes (64 floats -> 8 bytes at m=8), and query scoring becomes
 * `m` table lookups per vector (asymmetric distance computation, ADC)
 * instead of a full float dot product. At 1e12 vectors the code table fits
 * where the raw vectors never could, and the scan is memory-bandwidth-
 * bound on 8-byte rows.
 *
 * Spark shape: training is m independent k-means runs over sub-vectors
 * (the same deterministic DataFrame k-means as IVF); encoding is one
 * codegen'd expression (codebooks plan-embedded); search precomputes each
 * query's m x ks lookup table on the driver (queries are the small side by
 * definition), embeds the tables in a scoring expression, and scans the
 * code table once — no shuffle of either side, then the standard two-phase
 * exact top-k.
 *
 * Everything is deterministic: sub-space codebooks derive from the same
 * hash-seeded k-means as IVF, so the index is reproducible with no stored
 * model.
 */
/** Trained PQ model: `m` codebooks of `ks` centroids over dims/m-wide
  * sub-vectors. Top-level (not nested in the object) so generated code can
  * name the type in Java source. */
final case class PqModel(dims: Int, m: Int, ks: Int,
                         codebooks: Array[Array[Array[Double]]]) extends Serializable {
  require(dims % m == 0, s"dims $dims must divide into m=$m sub-spaces")
  def subDims: Int = dims / m
}

object Pq {

  /** Train per-sub-space codebooks (deterministic k-means each). */
  def train(corpus: DataFrame, dims: Int, m: Int = 8, ks: Int = 16,
            iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding"): PqModel = {
    require(dims % m == 0, s"dims $dims must divide into m=$m sub-spaces")
    val sub = dims / m
    val books = (0 until m).map { j =>
      val subDf = corpus.select(col(idCol),
        slice(col(vecCol), j * sub + 1, sub).as(vecCol))
      Ivf.train(subDf, ks, iters, idCol, vecCol)
    }.toArray
    PqModel(dims, m, ks, books)
  }

  /** Code column: array<int> of length m (nearest sub-space centroid each). */
  def encode(vec: Column, model: PqModel): Column =
    org.apache.spark.sql.graftshim.shims.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.graftshim.shims.expression(vec), model))

  /**
   * ADC top-k: approximate inner-product scores from the code table.
   * `queries` collects to the driver (it is the user's query batch); each
   * query's m x ks lookup table embeds in the scoring expression, so the
   * corpus side is ONE scan of (id, code) rows with m array lookups per
   * (query, vector) — no vectors move, nothing shuffles before the
   * two-phase top-k.
   */
  def adcTopK(codes: DataFrame, queries: DataFrame, k: Int, model: PqModel,
              idCol: String = "vec_id", vecCol: String = "embedding",
              codeCol: String = "pq_code"): DataFrame = {
    val qRows = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")).collect()
    val qIds = qRows.map(_.getAs[Long]("query_id"))
    val luts = qRows.map { r =>
      val q = r.getAs[scala.collection.Seq[Any]]("q_vec").map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray
      lut(q, model)
    }
    val qDf = codes.sparkSession.createDataFrame(
      qIds.zipWithIndex.map { case (id, i) => (id, i) }.toSeq).toDF("query_id", "__qi")
    val scored = codes.select(col(idCol).as("nn_id"), col(codeCol).as("__code"))
      .crossJoin(broadcast(qDf))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", org.apache.spark.sql.graftshim.shims.column(
        graft.functions.PqAdcScore(
          org.apache.spark.sql.graftshim.shims.expression(col("__code")),
          org.apache.spark.sql.graftshim.shims.expression(col("__qi")),
          luts, normSqTable(model))))
    Ann.topKPerQuery(scored, k)
  }

  /** IVFADC scoring half: `lists` carries (nn_id, cluster, pq_code); each
    * query joins only its `nprobe` nearest lists (bucket equi-join — the
    * corpus is never scanned whole), then scores candidates by ADC. */
  private[operators] def adcTopKProbed(lists: DataFrame, queries: DataFrame, k: Int,
                                       model: PqModel, centroids: Array[Array[Double]],
                                       nprobe: Int, idCol: String, vecCol: String): DataFrame = {
    val qRows = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")).collect()
    val luts = qRows.map { r =>
      val q = r.getAs[scala.collection.Seq[Any]]("q_vec").map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray
      lut(q, model)
    }
    val probeRows = qRows.zipWithIndex.flatMap { case (r, i) =>
      val q = r.getAs[scala.collection.Seq[Any]]("q_vec").map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray
      graft.functions.NearestCentroids.nearestD(q, centroids, nprobe)
        .map(c => (r.getAs[Long]("query_id"), i, c))
    }.toSeq
    val probes = lists.sparkSession.createDataFrame(probeRows)
      .toDF("query_id", "__qi", "cluster")
    lists
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", org.apache.spark.sql.graftshim.shims.column(
        graft.functions.PqAdcScore(
          org.apache.spark.sql.graftshim.shims.expression(col("pq_code")),
          org.apache.spark.sql.graftshim.shims.expression(col("__qi")),
          luts, normSqTable(model))))
      .transform(Ann.topKPerQuery(_, k))
  }

  /** Per-query lookup table: lut(j)(c) = dot(q_subj, codebook(j)(c)) / |q|.
    * Scores become approximate cosine once divided by the reconstruction
    * norm (from [[normSqTable]]) at scoring time. */
  private[operators] def lut(q: Array[Double], model: PqModel): Array[Array[Double]] = {
    var nq = 0.0
    q.foreach(x => nq += x * x)
    val qn = if (nq == 0) 1.0 else math.sqrt(nq)
    val sub = model.subDims
    Array.tabulate(model.m) { j =>
      Array.tabulate(model.ks) { c =>
        val cent = model.codebooks(j)(c)
        var d = 0.0
        var i = 0
        while (i < sub && i < cent.length) {
          d += q(j * sub + i) * cent(i)
          i += 1
        }
        d / qn
      }
    }
  }

  /** normSq(j)(c) = |codebook(j)(c)|^2 — the reconstruction's squared norm
    * decomposes as the sum over sub-spaces. */
  private[operators] def normSqTable(model: PqModel): Array[Array[Double]] =
    Array.tabulate(model.m) { j =>
      Array.tabulate(model.ks) { c =>
        var s = 0.0
        model.codebooks(j)(c).foreach(x => s += x * x)
        s
      }
    }
}
