package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions._
import graft.core.hash.XXH3

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
    * double. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

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
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nn_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank"), col("cos"))
  }

  /** Deterministic gaussian hyperplane component for (table, plane, dim):
    * Box-Muller over two XXH3-derived uniforms. */
  private def gaussian(table: Int, plane: Int, dim: Int): Double = {
    def u(salt: Int): Double = {
      val b = new Array[Byte](12)
      var v = (table.toLong << 40) ^ (plane.toLong << 20) ^ dim.toLong
      var i = 0
      while (i < 8) { b(i) = (v >>> (8 * i)).toByte; i += 1 }
      b(8) = salt.toByte; b(9) = 42; b(10) = 0x5a; b(11) = salt.toByte
      math.max((XXH3.hash(b) >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
    }
    math.sqrt(-2.0 * math.log(u(1))) * math.cos(2.0 * math.Pi * u(2))
  }

  /** Signature column: `planes`-bit sign sketch of the vector under
    * deterministic hyperplanes (all builtin expressions). */
  def lshSignature(vec: Column, dims: Int, planes: Int, table: Int): Column = {
    val bitCols = (0 until planes).map { p =>
      val dotExpr = (0 until dims).map { d =>
        element_at(vec, d + 1).cast("double") * lit(gaussian(table, p, d))
      }.reduce(_ + _)
      when(dotExpr >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

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

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nn_id").asc)
    candidates.withColumn("cos", cosine(col("q_vec"), col("nn_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), col("rank"), col("cos"))
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
