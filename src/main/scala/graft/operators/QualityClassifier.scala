package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{hashed_ngram_features, linear_score_lit}

/** Model-based quality filtering — the DCLM/fastText-style linear
  * classifier over hashed n-gram features (Li et al. 2024 "DataComp-LM";
  * Joulin et al. 2016 fastText; Weinberger et al. 2009 feature hashing):
  * train logistic regression on a small labeled slice ("looks like a good
  * reference page" vs "looks like crawl junk"), then score the whole
  * corpus with one codegen'd map.
  *
  * Scale shape:
  *  - Scoring — the part that touches all 100 TB — is [[score]]: a single
  *    [[graft.functions.LinearScoreLit]] projection with the weights
  *    embedded per-executor (addReferenceObj). No joins, no shuffles, no
  *    per-row weight deserialization; prunes to (id, text) at the scan.
  *  - Training touches only the labeled slice (thousands-to-millions of
  *    rows in practice). Each full-batch GD iteration is one explode +
  *    `groupBy(idx)` — a shuffle bounded by `dim`, not by corpus size.
  *
  * Determinism: gradient contributions are accumulated as FIXED-POINT
  * longs (2^24 scale). Long addition commutes exactly, so the trained
  * weights are bit-identical under any partitioning/scheduling — double
  * summation would make the model (and every downstream keep/drop
  * decision) run-dependent. The quantization (~6e-8 per contribution) is
  * far below any meaningful gradient signal.
  */
object QualityClassifier {

  /** Trained model; `score = sigmoid(bias + w · features)`. */
  final case class LinearModel(weights: Array[Double], bias: Double,
                               dim: Int, maxN: Int)

  private final val Scale = (1L << 24).toDouble

  /** Train logistic regression with `iters` full-batch GD steps on rows
    * `(textCol, labelCol in {0,1})`. `l2` is standard ridge shrinkage
    * (applied to weights, not bias). The labeled frame is re-read every
    * iteration — cache() it if it is not already a small materialized
    * slice. */
  def trainLogReg(labeled: DataFrame, dim: Int = 1 << 16, maxN: Int = 2,
                  iters: Int = 20, lr: Double = 0.5, l2: Double = 0.0,
                  textCol: String = "text", labelCol: String = "label"): LinearModel = {
    require(iters >= 1 && lr > 0 && l2 >= 0, "iters >= 1, lr > 0, l2 >= 0")
    val feats = labeled.select(
      hashed_ngram_features(col(textCol), dim, maxN).as("f"),
      col(labelCol).cast("double").as("y"))
    val n = feats.count().toDouble
    require(n > 0, "training slice is empty")
    var w = new Array[Double](dim)
    var b = 0.0
    var it = 0
    while (it < iters) {
      // err = sigmoid(score) - y, computed once per row; per-feature
      // gradient rows (idx, round(err * v * 2^24)) sum exactly as longs
      val err = (lit(1.0) / (lit(1.0) +
        exp(-linear_score_lit(col("f"), w, b)))) - col("y")
      // bias rides along as pseudo-feature idx = -1 (v = 1), so each
      // iteration is ONE job: project err, explode, groupBy(idx)
      val g = feats.select(err.as("e"),
          concat(col("f"),
            array(struct(lit(-1).as("idx"), lit(1L).as("v")))).as("f"))
        .select(col("e"), explode(col("f")).as("x"))
        .select(col("x.idx").as("idx"),
          round(col("e") * col("x.v") * lit(Scale)).cast("long").as("gq"))
        .groupBy(col("idx")).agg(sum(col("gq")).as("gq"))
        .collect()
      val w2 = w.clone()
      var gBias = 0L
      var i = 0
      while (i < g.length) {
        val idx = g(i).getInt(0)
        if (idx < 0) gBias = g(i).getLong(1)
        else w2(idx) -= lr * (g(i).getLong(1) / Scale / n + l2 * w(idx))
        i += 1
      }
      if (l2 > 0) { // features absent from every doc still shrink
        var j = 0
        while (j < dim) {
          if (w2(j) == w(j)) w2(j) -= lr * l2 * w(j)
          j += 1
        }
      }
      w = w2
      b -= lr * gBias / Scale / n
      it += 1
    }
    LinearModel(w, b, dim, maxN)
  }

  /** Score every document: `(idCol..., quality_logit, quality_prob)`.
    * One codegen'd projection — the 100-TB path. */
  def score(docs: DataFrame, model: LinearModel, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val z = linear_score_lit(
      hashed_ngram_features(col(textCol), model.dim, model.maxN),
      model.weights, model.bias)
    docs.select(col(idCol), z.as("quality_logit"))
      .withColumn("quality_prob",
        lit(1.0) / (lit(1.0) + exp(-col("quality_logit"))))
  }
}
