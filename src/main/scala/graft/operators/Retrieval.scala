package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BM25 full-text retrieval over the corpus — the ranked-lookup stage a
 * training-data pipeline uses for retrieval-based decontamination ("which
 * corpus docs does this benchmark question retrieve?"), data selection,
 * and eval-neighbor audits. (The reference engine has no text-retrieval
 * surface; this is part of the LLM-pipeline extension. Scoring follows
 * Robertson-Sparck Jones BM25 as in Robertson & Zaragoza 2009.)
 *
 * Index construction is the standard distributed inverted index: ONE
 * explode + groupBy(term, doc_id) pass builds term frequencies; document
 * frequencies and lengths derive from it without rescanning the corpus.
 * Scoring joins the (small) query-term table to the tf table on the term
 * equi-key — Catalyst broadcasts the query side when it fits, and at
 * 100 TB the join stays a hash equi-join with no corpus-side sort — then
 * one groupBy(query_id, doc_id) sums per-term contributions and a
 * per-query window takes top-k (the window shuffles by query_id: bounded
 * by the query count, never by corpus size).
 *
 * Determinism: scores are rounded to `roundTo` decimals BEFORE ranking,
 * and ties rank by ascending doc_id, so results are bit-stable across
 * partitionings and replayable by a SQL oracle (double-sum association
 * differences live far below the rounding grid).
 */
object Retrieval {

  /** BM25 top-k: docs (idCol, textCol) x queries (queryIdCol, textCol) ->
    * (query_id, doc_id, score, rank), rank 1..k per query.
    *
    * Tokenization: lowercase whitespace terms (empty terms drop). Query
    * term multiplicity acts as a linear qtf factor (classic BM25 without
    * the k3 saturation). k1/b are the standard defaults.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75, roundTo: Int = 6,
               idCol: String = "doc_id", textCol: String = "text",
               queryIdCol: String = "query_id"): DataFrame = {
    require(k > 0, "bm25TopK: k must be positive")
    val terms = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    // one shuffle builds tf; df/dl/N/avgdl all derive from tf (no rescan)
    val tf = terms.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val qterms = queries
      .select(col(queryIdCol).cast("long").as("query_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("qtf"))

    // scoring: query terms -> matching postings; idf via the small df side
    val scored = qterms
      .join(df, Seq("term"))
      .join(tf, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats)) // 1 row: N + avgdl ride along
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("qtf") * col("idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("contrib")), roundTo).as("score"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
