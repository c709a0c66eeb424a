package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact integer allocation — distribute a per-group integer total
  * across the group's rows proportionally to an integer weight, with
  * largest-remainder rounding so the allocations SUM BACK EXACTLY to
  * the total. The billing/cost-attribution primitive ("split the order
  * total across its lines by quantity", "prorate cluster cost across
  * teams by usage") where float proration loses cents and a reconcile
  * job has to chase them.
  *
  * Method (Hamilton / largest remainder): each row gets
  * ⌊total·w/W⌋ plus one extra unit for the `total − Σ⌊·⌋` rows with
  * the largest remainder `(total·w) mod W`, ties broken by `tieCols`
  * so the result is unique. All arithmetic is 64-bit integer —
  * engine-exact, oracle-hashable; `total·w` must fit a long (the
  * caller scales money to integer cents first).
  */
object Allocate {

  /** Returns the input columns plus `alloc` (long), one row per input
    * row, with `sum(alloc) == first(totalCol)` within every group.
    * `totalCol` must be constant within a group; `weightCol` must be
    * a non-negative integer column with a positive group sum.
    *
    * SCALE SHAPE: two windows over the GROUP partition (sum + rank) —
    * state is one group in memory, bounded by rows-per-group (order
    * lines, team members: small by construction); groups themselves
    * are hash-distributed. No joins, no collect, one exchange.
    */
  def largestRemainder(df: DataFrame, groupCols: Seq[String],
                       weightCol: String, totalCol: String,
                       tieCols: Seq[String]): DataFrame = {
    val key = groupCols.map(col)
    val wGrp = Window.partitionBy(key: _*)
    val wRank = Window.partitionBy(key: _*)
      .orderBy(col("_rem").desc +: tieCols.map(col): _*)
    df.withColumn("_W", sum(col(weightCol)).over(wGrp))
      .withColumn("_base",
        expr(s"($totalCol * $weightCol) DIV _W"))
      .withColumn("_rem",
        expr(s"($totalCol * $weightCol) % _W"))
      .withColumn("_deficit",
        col(totalCol) - sum(col("_base")).over(wGrp))
      .withColumn("_rank", row_number().over(wRank))
      .withColumn("alloc",
        col("_base") + when(col("_rank") <= col("_deficit"), 1L)
          .otherwise(0L))
      .drop("_W", "_base", "_rem", "_deficit", "_rank")
  }
}
