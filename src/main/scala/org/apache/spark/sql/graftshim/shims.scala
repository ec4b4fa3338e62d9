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
}
