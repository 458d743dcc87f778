package org.apache.spark.sql.graftshims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` seams (Spark 4.x classic
  * module). Custom native Catalyst expressions (graft.functions.*) need
  * the Column <-> Expression converters to surface as user-facing
  * Columns; the custom whole-operator plan (graft.plans.TopKPerGroup)
  * needs the Dataset factory to hand its LogicalPlan to the session.
  * Living in an `org.apache.spark.sql` subpackage grants the access. No
  * other Spark internals are touched.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Eager Column -> catalyst Expression conversion. `expression` returns
    * a LAZY ColumnNodeExpression wrapper that the analyzer normally
    * unwraps; expressions embedded in a custom LogicalPlan node skip that
    * rule and the wrapper (holding non-serializable internal ColumnNode
    * state) would reach task serialization. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
