package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column <-> Expression bridge for Spark 4.x, where the converters in
 * `org.apache.spark.sql.classic.ExpressionUtils` are private[sql]. Placing
 * this one-file shim inside the org.apache.spark.sql package tree is the
 * standard idiom for Catalyst-extension libraries (the alternative —
 * round-tripping every expression through SQL text — loses type info and
 * costs a parse per call).
 */
object shims {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** DataFrame over an InternalRow RDD with FRESH attribute ids — the
    * re-rooting primitive behind the engine's `pin` (self-join-safe
    * references to a materialized frame). The public alternative,
    * `createDataFrame(df.toJavaRDD, schema)`, round-trips every row
    * through the boxed RowEncoder on write AND per downstream reference —
    * measured ~50 CPU-seconds on a 1.5M-row pin; this is a zero-copy
    * re-wrap of the already-checkpointed rows. */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
