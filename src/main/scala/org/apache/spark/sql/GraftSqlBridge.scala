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

  /** Unload every streaming state-store provider loaded in this JVM
    * (closes RocksDB native handles, releases their off-heap memory
    * and background compaction work). A stopped streaming query does
    * NOT unload its providers — they linger until the maintenance
    * thread's next eviction pass, and their native background work
    * taxes whatever runs next. Drain-style callers (bench reps, test
    * suites) that never reuse a checkpoint should call this after each
    * query; a RESUMABLE query must not (the provider cache is the
    * point), which is why this is not wired into the drain helpers.
    * Re-exports `StateStore.unloadAll()` only.
    */
  def unloadStateStores(): Unit =
    execution.streaming.state.StateStore.unloadAll()
}
