package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for the one `private[sql]` constructor the engine's
  * custom-operator API needs: wrapping a programmatically-built
  * [[LogicalPlan]] (e.g. [[graft.plans.AsOfJoinPlan]]) back into a
  * DataFrame. This is the standard extension-point shim — no Spark
  * internals are modified, only re-exported.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ catalyst Expression, for custom expressions carrying
    * build-time constants ([[graft.functions.ArgmaxCentroidExpr]]'s
    * centroid bank) that the FunctionRegistry literal-argument route
    * cannot transport. Re-exports `classic.ExpressionUtils` only.
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = classic.ExpressionUtils.column(e)

  def expressionOf(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
