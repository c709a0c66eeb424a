package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-tolerant interval coalescing — the reference's `RegionIterator`.
  *
  * Reference semantics (`program/src/main/java/hmushtaq/sparkga1/utils/
  * RegionIterator.java:59,101-132`): stream reads sorted by start; merge
  * intervals whose start is within `gap` (INTERVAL_OVERLAP=51) of the running
  * max end; emit `(chr, start, end)` on each gap break.
  *
  * Two Spark-native formulations:
  *
  *  1. `coalesceIntervals` — the window formulation: `lag` + running-max +
  *     cumulative gap-flag sum = session id, then groupBy(session). Fully
  *     codegen'd/spillable; one shuffle on the partition key. This is the
  *     100 TB path: Catalyst sorts each key group with the spillable
  *     `SortExec`, unlike the reference's in-memory-only sort.
  *
  *  2. `graft.functions.IntervalUnionAgg` — a typed `Aggregator` computing
  *     the merged interval *set* per key in one pass; unlike the window form
  *     it does a true interval-set union in the merge step (handles
  *     non-adjacent buffers from different partitions), so it works as a
  *     partial aggregate without a pre-sort shuffle of raw rows.
  */
object Sessionize {

  /** Window formulation. Returns one row per merged interval:
    * (keyCols..., sess_start, sess_end, n_rows).
    * Rows must carry numeric/orderable `startCol` and `endCol`.
    */
  def coalesceIntervals(df: DataFrame, keyCols: Seq[String],
                        startCol: String, endCol: String, gap: Long,
                        tieBreak: Seq[String] = Nil): DataFrame = {
    val key = keyCols.map(col)
    val ord = (col(startCol) +: tieBreak.map(col)) :+ col(endCol)
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
    val runMax = Window.partitionBy(key: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withFlag = df
      .withColumn("_prev_max_end", max(col(endCol)).over(runMax))
      // new session when this start is more than `gap` past everything seen
      .withColumn("_new_sess",
        when(col("_prev_max_end").isNull ||
             col(startCol) > col("_prev_max_end") + gap, 1).otherwise(0))
      .withColumn("_sess", sum(col("_new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    withFlag
      .groupBy((key :+ col("_sess")): _*)
      .agg(
        min(col(startCol)).as("sess_start"),
        max(col(endCol)).as("sess_end"),
        count(lit(1)).as("n_rows"))
      .drop("_sess")
  }

  /** Event sessionization (points, not intervals): gap on a single ordered
    * column — `start == end == ts`. Mirrors session_window semantics for
    * batch data.
    */
  def sessionizeEvents(df: DataFrame, keyCols: Seq[String], tsCol: String,
                       gap: Long): DataFrame =
    coalesceIntervals(df, keyCols, tsCol, tsCol, gap)

  /** Burst collapse (debounce): keep only the FIRST event of every
    * gap-delimited burst per key — "the user mashed the button five
    * times in two seconds" dedup, the retention-safe cousin of
    * dropDuplicates (it keeps one representative per burst, not per
    * value). A row survives iff no prior same-key event lies within
    * `gap` of it — exactly the session-start test of the q10
    * sessionization window, so this is ONE window pass, no join, and
    * the streaming twin is `session_window` + first().
    * `tieCol` breaks equal-timestamp order deterministically; later
    * ties inside a burst collapse into its head.
    */
  def burstCollapse(df: DataFrame, keyCols: Seq[String], tsCol: String,
                    tieCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_pm", max(col(tsCol)).over(w))
      .where(col("_pm").isNull || col(tsCol) > col("_pm") + gap)
      .drop("_pm")
  }
}
