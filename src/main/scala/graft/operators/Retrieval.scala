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
    // scale-adaptive width for the tokenize stage: a corpus narrower than
    // the session's parallelism (one small parquet file locally) would run
    // the explode+tf aggregation — the index build's whole CPU cost — in
    // that handful of tasks. Widen ONLY then; a corpus that already scans
    // wide (the 100-TB case: thousands of input splits) must not pay a
    // full-text shuffle for nothing.
    val para = docs.sparkSession.sparkContext.defaultParallelism
    val docsWide =
      if (docs.rdd.getNumPartitions < para)
        docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
          .repartition(para)
      else docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
    val terms = docsWide
      .select(col("doc_id"), explode(split(lower(col("__text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    // one shuffle builds tf; a window over the doc partition attaches the
    // doc length to every posting WITHOUT a per-query dl join (the join
    // used to shuffle+sort the matched posting stream by doc_id on every
    // scoring call — now dl is part of the index row). The combined
    // (term, doc_id, tf, dl) index is PINNED: the plan references it for
    // scoring, df and stats, and Catalyst re-expands an unpinned subtree
    // per reference — the corpus was tokenized and aggregated 4x per run
    // (measured as four identical serial stages at sf0.1).
    val tf0 = terms.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val index = Dedup.pin(tf0.select(col("term"), col("doc_id"), col("tf"),
      sum(col("tf")).over(wDoc).as("dl")))
    // corpus stats from the pinned state: dl is constant within a doc, so
    // max(dl) per doc reproduces the doc-length table exactly
    val dl = index.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

    val qterms = queries
      .select(col(queryIdCol).cast("long").as("query_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("qtf"))

    // df ONLY for terms the queries mention (identical values for every
    // term actually used — non-query terms' df never enters a score): a
    // broadcast semi-join prunes the postings BEFORE the df aggregation,
    // so the term-keyed shuffle carries matched postings, not the corpus
    val df = index.join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

    // scoring: the query-side (qterms x df, bounded by the query batch) is
    // BROADCAST, so the index is probed in place — never shuffled, never
    // sorted, no join strategy left to size estimates (the pinned state
    // has none and used to fall to SortMergeJoin). Probe width: the pinned
    // state can be AQE-coalesced to a handful of partitions while the join
    // OUTPUT (matched postings) is the big thing — spread the probe side
    // first, exactly like the sparse-cosine prefix join; guarded so a
    // corpus that is already wide (the 100-TB case) does not reshuffle.
    val probe =
      if (index.rdd.getNumPartitions < para) index.repartition(para) else index
    val scored = probe
      .join(broadcast(qterms.join(df, Seq("term"))), Seq("term"))
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
