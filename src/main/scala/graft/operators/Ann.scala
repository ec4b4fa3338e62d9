package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - bruteForceTopK: exact cosine top-k — the correctness baseline. The dot
 *    product is `aggregate(zip_with(...))` (builtin, codegen'd); the join is
 *    a broadcast of the (small) query set against the (huge) corpus, so the
 *    corpus is scanned once with no shuffle of the vectors themselves.
 *  - lshTopK: random-hyperplane LSH (sign sketches) — the scale path. Bucket
 *    join on multi-table signatures, exact cosine re-rank of candidates
 *    only. Hyperplanes are deterministic (hash-derived gaussians), so the
 *    index is reproducible with no stored model.
 */
object Ann {

  /** cosine(a, b) over array<float>/array<double> columns, computed in
    * double by a codegen'd tight loop (graft.functions.CosineSim — the
    * zip_with/aggregate formulation is CodegenFallback and measured ~20x
    * slower on million-pair candidate sets). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.shims.column(
      graft.functions.CosineSim(
        org.apache.spark.sql.graftshim.shims.expression(a),
        org.apache.spark.sql.graftshim.shims.expression(b)))

  /**
   * Exact top-k neighbors for each query id. `queries` must be small enough
   * to broadcast (it is the user's query batch); the corpus side never
   * shuffles — one scan, one broadcast-nested-loop, then a per-query top-k
   * window over (query, corpus-partition) partial results.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nn_vec")))
    topKPerQuery(scored, k)
  }

  /** Exact top-k per query in two phases: a local top-k inside each (query,
    * physical partition) first, so the global per-query sort only sees
    * <= partitions*k survivors — a single per-query window would funnel the
    * whole scored corpus into #queries partitions. */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val wLocal = Window.partitionBy(col("query_id"), col("__pid"))
      .orderBy(col("cos").desc, col("nn_id").asc)
    val local = scored.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(wLocal))
      .filter(col("__r") <= k)
      .drop("__r", "__pid")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nn_id").asc)
    local.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank"), col("cos"))
  }

  /** Signature column: `planes`-bit sign sketch under the deterministic
    * hyperplane table (single codegen'd expression; the per-element
    * element_at formulation built a ~4000-node expression tree whose
    * compilation dominated runtime). */
  def lshSignature(vec: Column, dims: Int, planes: Int, table: Int): Column =
    org.apache.spark.sql.graftshim.shims.column(
      graft.functions.LshSig(
        org.apache.spark.sql.graftshim.shims.expression(vec), planes, table))

  /**
   * LSH ANN: `tables` independent sign-sketch tables of `planes` bits.
   * Candidates = ids sharing any (table, signature) bucket with the query;
   * exact cosine re-ranks candidates. Recall grows with `tables`, bucket
   * size shrinks with `planes` — at web scale the bucket join replaces the
   * full cross product (the only corpus-wide work is computing signatures,
   * one scan, no shuffle of vectors).
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int,
              planes: Int = 12, tables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withSigs(df: DataFrame, id: String, vec: String): DataFrame = {
      val sigCols = (0 until tables).map { t =>
        struct(lit(t).as("tbl"), lshSignature(col(vec), dims, planes, t).as("sig"))
      }
      df.select(col(id), col(vec), explode(array(sigCols: _*)).as("s"))
        .select(col(id), col(vec), col("s.tbl").as("tbl"), col("s.sig").as("sig"))
    }
    val cSig = withSigs(corpus.select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec")), "nn_id", "nn_vec")
    val qSig = withSigs(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")), "query_id", "q_vec")

    val candidates = cSig.join(broadcast(qSig), Seq("tbl", "sig"))
      .filter(col("nn_id") =!= col("query_id"))
      .select(col("query_id"), col("q_vec"), col("nn_id"), col("nn_vec"))
      .dropDuplicates("query_id", "nn_id")

    topKPerQuery(candidates.withColumn("cos", cosine(col("q_vec"), col("nn_vec"))), k)
  }

  /** Embedding near-duplicate pairs: all (a<b) with cosine >= minCos.
    * Exact form is a self-join; at scale pass `planes`>0 to pre-block by a
    * single LSH table (near-dup vectors nearly always share the sketch). */
  def cosineNearDupPairs(embs: DataFrame, minCos: Double, dims: Int,
                         planes: Int = 0,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = embs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val pairs =
      if (planes <= 0)
        base.as("a").join(base.as("b"), col("a.id") < col("b.id"))
      else {
        val sig = base.withColumn("sig", lshSignature(col("vec"), dims, planes, 0))
        sig.as("a").join(sig.as("b"),
          col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      }
    pairs.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.vec"), col("b.vec")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
