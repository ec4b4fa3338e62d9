package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * Deduplication operators for webtext training-data pipelines. All are
 * declarative DataFrame plans (Catalyst-optimizable, shuffle-aware):
 *
 *  - exact:          hash group-by, one shuffle on a 64-bit fingerprint
 *  - n-gram Jaccard: explode shingles -> inverted-index self-join (the
 *                    textbook exact set-similarity join)
 *  - MinHash + LSH:  k min-hashes -> b bands -> bucket self-join ->
 *                    exact-Jaccard verification of candidates only
 *  - SimHash:        64-bit fingerprint, banded blocking (pigeonhole:
 *                    hamming<=3 implies one of 4 16-bit bands equal)
 *  - embedding cosine near-dup: see Ann.scala (shared kernel)
 *
 * Scale notes are on each operator; the common theme is that every
 * candidate-generation step is a hash-partitioned equi-join (no cross
 * joins) and every verification runs only on candidates.
 */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text, keyed by a
    * 128-bit content signature (XXH3 + an independent rolling hash), so the
    * shuffle carries 16 bytes per row — never the text. Two distinct texts
    * sharing both hashes is a ~2^-128 event (the standard content-address
    * assumption); callers needing literal byte-compare semantics can group
    * by the text column directly at the cost of shuffling it. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(xxh3_64(col(textCol)).as("__h1"),
        fingerprint64(col(textCol)).as("__h2"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))

  /** Distinct word n-gram shingles of a text column (documents shorter than
    * n words collapse to one whole-text shingle). Pure builtins — stays in
    * whole-stage codegen. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    array_distinct(
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))
  }

  /**
   * Exact n-gram Jaccard self-similarity join: all pairs (a < b) with
   * J(shingles(a), shingles(b)) >= minJaccard.
   *
   * Plan: explode distinct shingles -> join on shingle (inverted index) ->
   * count co-occurrences = |A ∩ B| -> J = inter / (|A|+|B|-inter).
   * Scale: the only quadratic blow-up risk is ubiquitous shingles;
   * `maxShingleDf` (0 = off, exact) drops shingles appearing in more than
   * that many docs before the join — the standard prefix-filter relaxation,
   * off by default so results stay exactly oracle-comparable.
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.5,
                        idCol: String = "doc_id", textCol: String = "text",
                        maxShingleDf: Int = 0): DataFrame = {
    val sh0 = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("sh"))
    val sh = if (maxShingleDf > 0) {
      val df = sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxShingleDf).select("sh")
      sh0.join(df, "sh")
    } else sh0
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))

    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * MinHash + LSH near-dup pairs. k min-hash signatures from one explode +
   * k min() aggregates (hash_i(s) = xxh3(s + "#" + i)); signatures cut into
   * `bands`; docs sharing any band bucket become candidates (one equi-join
   * on (band, bucketHash)); candidates are verified with exact Jaccard.
   *
   * Scale: the expensive exact-Jaccard join runs ONLY on LSH candidates
   * (left-semi pushdown), which is what makes near-dedup feasible at 1e12
   * docs — recall is tunable via (k, bands): P(candidate) = 1-(1-J^r)^b.
   */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, minJaccard: Double = 0.5,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    val sh = docs.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("sh"))

    val minhashCols = (0 until numHashes).map { i =>
      min(xxh3_64(concat(col("sh"), lit(s"#$i")))).as(s"mh_$i")
    }
    val sigs = sh.groupBy(col("id")).agg(minhashCols.head, minhashCols.tail: _*)

    // band bucket id = xxh3 of the concatenated row hashes of that band
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), xxh3_64(concat_ws("|", parts: _*)).as("bucket"))
    }
    val buckets = sigs.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // verify candidates with exact Jaccard (restrict the inverted-index join
    // to candidate ids via left-semi joins, then keep candidate pairs only)
    val candIdsA = candidates.select(col("id_a").as("id")).distinct()
    val candIdsB = candidates.select(col("id_b").as("id")).distinct()
    val shCand = sh.join(candIdsA.unionByName(candIdsB).distinct(), Seq("id"), "left_semi")
    val sizes = shCand.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = shCand.as("a").join(shCand.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(candidates, Seq("id_a", "id_b"), "left_semi")

    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * SimHash near-dup pairs with Hamming distance <= maxHamming (< 16).
   * Blocking: 4 bands of 16 bits; any pair within hamming<=3 must agree on
   * at least one band (pigeonhole), so candidates come from 4 equi-joins,
   * then bit_count(a^b) verifies. For maxHamming in [4,7] use 8 8-bit
   * bands, handled automatically.
   */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nBands = if (maxHamming <= 3) 4 else 8
    val bits = 64 / nBands
    val sigs = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))

    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * bits).bitwiseAND(lit((1L << bits) - 1)).as("key"))
    }
    val blocks = sigs.select(col("id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.key").as("key"))

    blocks.as("a").join(blocks.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
