package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions._

/**
 * Deterministic sampling for training-data pipelines. Random sampling
 * (`df.sample`) is partitioning-dependent and irreproducible across
 * clusters; every operator here derives its decisions from xxh3 of a key
 * column, so the SAME rows are chosen on any cluster, any partitioning,
 * any day — the property that makes dataset ablations and incremental
 * re-runs comparable.
 */
object Sampling {

  /** Keep ~`fraction` of rows: those whose salted key hash lands in the
    * bottom `fraction` of a fixed modulus. One codegen'd filter, no
    * shuffle, pushdown-friendly; the salt picks independent samples. */
  def byHash(df: DataFrame, fraction: Double, keyCol: String = "doc_id",
             salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    val m = 1000000000L
    df.filter(pmod(xxh3_64(concat(col(keyCol).cast("string"), lit("#"), lit(salt))), lit(m))
      < lit((fraction * m).round))
  }

  /**
   * EXACT per-stratum quotas, deterministic: each stratum keeps its
   * ceil(fraction * |stratum|) smallest rows by hashed-key order (a stable
   * pseudo-random order — so the quota is met exactly AND the chosen rows
   * are reproducible).
   *
   * Scale shape: quotas are one count aggregation (#strata rows,
   * broadcast); selection is the two-phase top-k used everywhere in this
   * engine — a local rank inside each (stratum, input partition) cuts
   * survivors to <= partitions * quota BEFORE the per-stratum global rank,
   * so no stratum funnels its full row set through one reducer.
   */
  def stratified(df: DataFrame, strataCol: String, fraction: Double,
                 keyCol: String = "doc_id"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    val quotas = df.groupBy(col(strataCol))
      .agg(ceil(count(lit(1)) * fraction).cast("long").as("__quota"))
    val hashed = df.withColumn("__h", xxh3_64(col(keyCol).cast("string")))
      .join(broadcast(quotas), strataCol)
    val wLocal = Window.partitionBy(col(strataCol), col("__pid"))
      .orderBy(col("__h").asc, col(keyCol).asc)
    val local = hashed.withColumn("__pid", spark_partition_id())
      .withColumn("__r", row_number().over(wLocal))
      .filter(col("__r") <= col("__quota"))
      .drop("__r", "__pid")
    val wGlobal = Window.partitionBy(col(strataCol))
      .orderBy(col("__h").asc, col(keyCol).asc)
    local.withColumn("__r", row_number().over(wGlobal))
      .filter(col("__r") <= col("__quota"))
      .select(df.columns.map(col).toIndexedSeq: _*) // original column order
  }
}
