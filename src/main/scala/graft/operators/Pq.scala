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

  /**
   * Train per-sub-space codebooks (deterministic k-means each).
   *
   * Scale shape: ONE deterministic sample of the corpus (the `sampleSize`
   * smallest xxh3(id) rows — one distributed top-n scan), cached; then one
   * pass over the cached sample per Lloyd iteration updates ALL m codebooks
   * at once (encode assigns every sub-space in a single codegen'd
   * expression; posexplode yields (sub-space, cluster, sub-vector) rows —
   * n*dims doubles through the shuffle, the data volume of one sample
   * pass). The previous formulation ran m INDEPENDENT k-means over the
   * full corpus: m*(iters+1) corpus scans — ~64 scans of a 100-TB table at
   * m=16/iters=3 — for codebooks a bounded sample determines equally well
   * (standard PQ practice trains on <= ~1M vectors). Seeds and assignment
   * tie-breaking are identical to the old per-sub-space runs, so when the
   * sample covers the corpus the resulting model is bit-identical.
   */
  def train(corpus: DataFrame, dims: Int, m: Int = 8, ks: Int = 16,
            iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding",
            sampleSize: Int = Ivf.defaultTrainSample): PqModel = {
    require(dims % m == 0, s"dims $dims must divide into m=$m sub-spaces")
    val sub = dims / m
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(col("vec").isNotNull && size(col("vec")) === dims)
      .withColumn("__h", graft.functions.GraftFunctions.xxh3_64(col("id").cast("string")))
    val sample = (if (sampleSize > 0) base.orderBy(col("__h")).limit(sampleSize) else base)
      .repartition(math.max(2, math.min(64, spark.sparkContext.defaultParallelism)))
      .cache()
    try {
      // per-sub-space seeds: sub-vectors of the ks smallest-hash rows (the
      // same rows each per-sub-space Ivf.train run would have seeded from)
      val seedRows = sample.orderBy(col("__h")).limit(ks)
        .select(col("vec"))
        .collect()
        .map(_.getAs[scala.collection.Seq[Any]]("vec").map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray)
      var books: Array[Array[Array[Double]]] =
        Array.tabulate(m)(j => seedRows.map(_.slice(j * sub, (j + 1) * sub)))

      var it = 0
      while (it < iters) {
        val model = PqModel(dims, m, ks, books)
        val updated = sample
          .select(posexplode(encode(col("vec"), model)).as(Seq("j", "cluster")),
            col("vec"))
          .select(col("j"), col("cluster"),
            slice(col("vec"), col("j") * lit(sub) + lit(1), lit(sub)).as("sv"))
          .groupBy(col("j"), col("cluster"))
          .agg(graft.functions.GraftFunctions.vec_sum(col("sv")).as("s"),
            count(col("sv")).as("n"))
          .collect()
        val next = books.map(_.map(_.clone()))
        updated.foreach { r =>
          val j = r.getAs[Int]("j")
          val c = r.getAs[Int]("cluster")
          val s = r.getAs[scala.collection.Seq[Double]]("s")
          val n = r.getAs[Long]("n").toDouble
          var d = 0
          while (d < s.length && d < next(j)(c).length) { next(j)(c)(d) = s(d) / n; d += 1 }
        }
        books = next
        it += 1
      }
      PqModel(dims, m, ks, books)
    } finally sample.unpersist(false)
  }

  /** Code column: array<int> of length m (nearest sub-space centroid each). */
  def encode(vec: Column, model: PqModel): Column =
    org.apache.spark.sql.graftshim.shims.column(
      graft.functions.PqEncode(
        org.apache.spark.sql.graftshim.shims.expression(vec), model))

  /** Read an id field with numeric widening: Int/Short/Byte id columns work
    * alongside the canonical Long, instead of a ClassCastException. */
  private def idLong(r: org.apache.spark.sql.Row, i: Int): Long = r.get(i) match {
    case l: Long => l
    case n: java.lang.Number => n.longValue()
    case other => sys.error(s"id column must be integral, got ${other.getClass.getName}")
  }

  /**
   * ADC top-k: approximate inner-product scores from the code table.
   * `queries` collects to the driver (it is the user's query batch); each
   * query's m x ks lookup table embeds in the scoring expression, so the
   * corpus side is ONE scan of (id, code) rows with m array lookups per
   * (query, vector) — no vectors move, nothing shuffles before the
   * two-phase top-k.
   *
   * `excludeSelf` drops rows where nn_id == query_id — correct when the
   * queries ARE corpus rows (the dedup/self-join use). Pass false when the
   * query batch is a distinct corpus whose ids merely coincide numerically,
   * or legitimate neighbors silently disappear.
   */
  def adcTopK(codes: DataFrame, queries: DataFrame, k: Int, model: PqModel,
              idCol: String = "vec_id", vecCol: String = "embedding",
              codeCol: String = "pq_code", excludeSelf: Boolean = true,
              maxQueries: Int = 65536): DataFrame = {
    Ann.requireQueryBatch(queries, maxQueries)
    val qRows = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")).collect()
    val qIds = qRows.map(idLong(_, 0))
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
      .filter(if (excludeSelf) col("nn_id") =!= col("query_id") else lit(true))
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
                                       nprobe: Int, idCol: String, vecCol: String,
                                       excludeSelf: Boolean = true,
                                       maxQueries: Int = 65536): DataFrame = {
    Ann.requireQueryBatch(queries, maxQueries)
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
        .map(c => (idLong(r, 0), i, c))
    }.toSeq
    val probes = lists.sparkSession.createDataFrame(probeRows)
      .toDF("query_id", "__qi", "cluster")
    lists
      .join(broadcast(probes), Seq("cluster"))
      .filter(if (excludeSelf) col("nn_id") =!= col("query_id") else lit(true))
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
