package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.hash.XXH3

/**
 * IVF (inverted-file) approximate nearest-neighbor index — the classic
 * coarse-quantizer scale path (Jégou et al., "Product quantization for
 * nearest neighbor search", the IVF part): k-means cluster the corpus, build
 * an inverted list per centroid, search only the `nprobe` nearest lists.
 *
 * Everything is deterministic and model-free-by-construction:
 *  - init: the k corpus vectors with the smallest xxh3(vec_id) (stable
 *    pseudo-random sample, reproducible on any cluster);
 *  - Lloyd iterations as DataFrame aggregations (assign = codegen'd
 *    NearestCentroids expression; update = posexplode + per-(cluster,dim)
 *    avg — one shuffle per iteration, centroid matrix collects to the
 *    driver: k*dims doubles, trivially small);
 *  - search: probe lists joined by cluster id (hash equi-join — the corpus
 *    is scanned once to assign, vectors never shuffle), exact cosine
 *    re-rank of candidates.
 */
object Ivf {

  /** Default training-sample bound: k-means coarse quantizers and PQ
    * codebooks are standard-practice trained on <= ~1M vectors; beyond that
    * the centroids stop moving but every Lloyd pass still costs a corpus
    * scan. 128k keeps driver collects trivial while being >> k*ks. */
  val defaultTrainSample: Int = 1 << 17

  /**
   * Train k centroids; returns the centroid matrix (k x dims).
   *
   * Scale shape: training runs over a CACHED deterministic sample (the
   * `sampleSize` smallest xxh3(id) rows — stable under any partitioning;
   * one distributed top-n pass over the corpus), so the source is scanned
   * ONCE no matter how many Lloyd iterations run. `sampleSize = 0` trains
   * on the full corpus (still one scan: the cache holds it). Null vectors
   * are excluded up front (they carry no training signal and would bias
   * the mean toward zero through the row count), and rows whose length
   * differs from the seeds' dimensionality are dropped from the update
   * (silently summing a shorter prefix would corrupt centroids).
   */
  def train(corpus: DataFrame, k: Int, iters: Int = 5,
            idCol: String = "vec_id", vecCol: String = "embedding",
            sampleSize: Int = defaultTrainSample): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .filter(col("vec").isNotNull)
      .withColumn("__h", graft.functions.GraftFunctions.xxh3_64(col("id").cast("string")))
    val sample = (if (sampleSize > 0) base.orderBy(col("__h")).limit(sampleSize) else base)
      .repartition(math.max(2, math.min(64, spark.sparkContext.defaultParallelism)))
      .cache()
    try {
      // dimensionality by MAJORITY over the sample (one tiny agg on the
      // cache), not from whichever vector happens to hash smallest: one
      // anomalous short/long vector landing first would otherwise poison
      // dim, silently dropping every normal row from the Lloyd updates
      val dimRow = sample.groupBy(size(col("vec")).as("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("d").asc).limit(1).collect()
      require(dimRow.nonEmpty, "Ivf.train: no non-null vectors to train on")
      val dim = dimRow(0).getAs[Int]("d")
      val clean = sample.filter(size(col("vec")) === dim)
      // deterministic seeds: k smallest xxh3(id) among clean rows — the
      // sample is the sampleSize smallest hashes, so these are the global
      // smallest (of the majority dimensionality) too
      val seeds = clean.orderBy(col("__h")).limit(k)
        .select(col("vec"))
        .collect()
        .map(_.getAs[scala.collection.Seq[Any]]("vec").map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray)
      require(seeds.nonEmpty, "Ivf.train: no vectors of the majority dimensionality")

      var centroids = seeds
      var it = 0
      while (it < iters) {
        val assigned = clean.withColumn("cluster",
          element_at(nearestCentroids(col("vec"), centroids, 1), 1))
        // centroid update as ONE vector-sum buffer per cluster: the previous
        // posexplode formulation shuffled dims rows PER VECTOR (a 64x row
        // blowup per Lloyd iteration at 64 dims); vec_sum carries dims
        // doubles per group through the partial-agg merge instead
        val updated = assigned
          .groupBy(col("cluster"))
          .agg(graft.functions.GraftFunctions.vec_sum(col("vec")).as("s"),
            count(col("vec")).as("n"))
          .collect()
        val next = centroids.map(_.clone())
        updated.foreach { r =>
          val s = r.getAs[scala.collection.Seq[Double]]("s")
          val n = r.getAs[Long]("n").toDouble
          val c = r.getAs[Int]("cluster")
          var d = 0
          while (d < s.length && d < next(c).length) { next(c)(d) = s(d) / n; d += 1 }
        }
        centroids = next
        it += 1
      }
      centroids
    } finally sample.unpersist(false)
  }

  /** Column of the `nprobe` nearest centroid ids for a vector column. */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    org.apache.spark.sql.graftshim.shims.column(
      graft.functions.NearestCentroids(
        org.apache.spark.sql.graftshim.shims.expression(vec), centroids, nprobe))

  /**
   * IVFADC top-k (Jégou et al.) — the billion-scale composition: corpus
   * vectors live as (IVF list id, PQ code) rows; a query probes `nprobe`
   * lists and scores ONLY those rows by PQ asymmetric distance (m array
   * reads each). Raw vectors appear nowhere in the search path — the scan
   * touches dims/m-compressed codes of 1/nlists of the corpus.
   */
  def adcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              centroids: Array[Array[Double]], model: PqModel, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    val lists = corpus.select(col(idCol).as("nn_id"),
        element_at(nearestCentroids(col(vecCol), centroids, 1), 1).as("cluster"),
        Pq.encode(col(vecCol), model).as("pq_code"))
    Pq.adcTopKProbed(lists, queries, k, model, centroids, nprobe, idCol, vecCol,
      excludeSelf)
  }

  /** IVF top-k: assign corpus to lists (1 probe), probe queries into
    * `nprobe` lists, exact cosine re-rank inside the probed lists.
    * `excludeSelf`: see [[Pq.adcTopK]] — only set when queries share the
    * corpus id namespace. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           centroids: Array[Array[Double]], nprobe: Int = 4,
           idCol: String = "vec_id", vecCol: String = "embedding",
           excludeSelf: Boolean = true, maxQueries: Int = 65536): DataFrame = {
    Ann.requireQueryBatch(queries, maxQueries)
    val lists = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
      .withColumn("cluster", element_at(nearestCentroids(col("nn_vec"), centroids, 1), 1))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("cluster", explode(nearestCentroids(col("q_vec"), centroids, nprobe)))

    val scored = lists.join(broadcast(probes), Seq("cluster"))
      .filter(if (excludeSelf) col("nn_id") =!= col("query_id") else lit(true))
      .dropDuplicates("query_id", "nn_id")
      .withColumn("cos", Ann.cosine(col("q_vec"), col("nn_vec")))
    Ann.topKPerQuery(scored, k)
  }
}
