package org.apache.spark.sql.graftshims

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column <-> Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x).
  * Custom native Catalyst expressions (graft.functions.*) need exactly
  * these two calls to surface as user-facing Columns; living in an
  * `org.apache.spark.sql` subpackage grants the access. No other Spark
  * internals are touched.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
