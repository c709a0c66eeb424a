package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics: conversion funnels and retention cohorts —
  * the product-analytics pair every event-table engine ships. Both are
  * pure aggregation pipelines (no window over the raw event stream):
  * per-user state is ONE row per user per step, so the shuffles carry
  * users, not events.
  */
object Funnel {

  /** Ordered-step conversion funnel: for each prefix of `steps`, the
    * number of users who completed it IN ORDER, with every later step
    * landing within `windowSec` of the user's FIRST step-1 event.
    * Earliest-completion semantics: each step's timestamp is the
    * earliest occurrence strictly after the previous step's.
    *
    * Scale shape: step k is one filtered aggregation on (user) joined
    * against step k−1's one-row-per-user table — k−1 user-keyed joins
    * of user-sized frames, never an event-table self-join. The output
    * is `steps.length` rows.
    */
  def conversion(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String],
                 windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("_t"))
      .withColumn("_t0", col("_t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      events.where(col(typeCol) === step)
        .join(prev.select(col(userCol), col("_t").as("_tp"),
          col("_t0")), userCol)
        .where(col(tsCol) > col("_tp") &&
          col(tsCol) <= col("_t0") + expr(s"INTERVAL $windowSec SECOND"))
        .groupBy(col(userCol))
        .agg(min(col(tsCol)).as("_t"), min(col("_t0")).as("_t0"))
    }
    steps.zip(reached).zipWithIndex.map { case ((step, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_idx"), lit(step).as("step"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Last-observation-carried-forward gap fill: NULLs in `valueCol`
    * take the latest non-null value within the key group under
    * `orderCols` (which must be a deterministic total order — include a
    * tiebreak id). The feature-pipeline "sensor dropped a reading"
    * repair; one window pass, partitioned by key, no self-join.
    */
  def locf(df: DataFrame, keyCols: Seq[String],
           orderCols: Seq[org.apache.spark.sql.Column],
           valueCol: String, outCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Long.MinValue, 0)
    df.withColumn(outCol,
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Multi-touch LINEAR attribution: every `touchDf` row (e.g. click)
    * within `window` (in timestamp units) BEFORE a `convDf` row (e.g.
    * purchase) of the
    * same key shares that conversion's value equally — credit =
    * value / #touches-in-window. The equal-split counterpart of the
    * last-touch as-of join (q134): budget reporting wants the whole
    * path credited, not just the final touch.
    *
    * SCALE SHAPE: one user-keyed equi-join (per-user event counts are
    * bounded — the blocking contract of every per-user operator here)
    * with the time band as a residual, then the touch count per
    * conversion is a window over the conversion id on the JOINED frame
    * (conversion-sized, not corpus-sized). Credits aggregate per touch
    * with a map-side-combined sum.
    *
    * Columns: convDf(keyCols, convTs, convId, valueCol),
    * touchDf(keyCols, touchTs, touchId). Timestamps numeric/orderable.
    */
  def multiTouchLinear(convDf: DataFrame, touchDf: DataFrame,
                       keyCols: Seq[String], convTs: String,
                       convId: String, valueCol: String, touchTs: String,
                       touchId: String, window: Long): DataFrame = {
    val joined = convDf.join(touchDf, keyCols)
      .where(col(touchTs) <= col(convTs) &&
        col(touchTs) > col(convTs) - lit(window))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(convId))
    joined
      .withColumn("_n_touch", count(lit(1)).over(w))
      .select(col(touchId),
        (col(valueCol) / col("_n_touch")).as("_credit"))
      .groupBy(col(touchId))
      .agg(round(sum(col("_credit")), 6).as("credit"),
        count(lit(1)).as("n_conversions"))
  }

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; one row per (cohort week, week offset) with the count of
    * cohort users active that week. `date_trunc('week')` is
    * Monday-anchored in Spark and DuckDB alike, and offsets are exact
    * integer day arithmetic — no epoch-fraction parity traps.
    */
  def weeklyCohorts(events: DataFrame, userCol: String, tsCol: String)
      : DataFrame = {
    val weeks = events.select(col(userCol),
      date_trunc("week", col(tsCol)).cast("date").as("_wk"))
    val cohort = weeks.groupBy(col(userCol))
      .agg(min(col("_wk")).as("cohort_week"))
    weeks.join(cohort, userCol)
      .groupBy(col("cohort_week"),
        (datediff(col("_wk"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Growth accounting: classify each active (user, day) as NEW (first
    * day ever), RETURNING (last activity within `resurrectGapDays`),
    * or RESURRECTED (came back after a longer silence), then count per
    * day — the DAU decomposition every growth review reads before the
    * topline ("is growth new users or resurrection?").
    *
    * SCALE SHAPE: distinct (user, day) first (map-side dedup of the
    * event fan-in), ONE per-user lag window over those day rows
    * (bounded by days-per-user, not events), one final aggregate.
    * `dayCol` is an integral day number.
    */
  def growthAccounting(df: DataFrame, userCol: String, dayCol: String,
                       resurrectGapDays: Int): DataFrame = {
    val days = df.select(col(userCol), col(dayCol)).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(dayCol))
    val classed = days
      .withColumn("_prev", lag(col(dayCol), 1).over(w))
      .withColumn("status",
        when(col("_prev").isNull, "new")
          .when(col(dayCol) - col("_prev") <= resurrectGapDays,
            "returning")
          .otherwise("resurrected"))
    classed.groupBy(col(dayCol))
      .agg(count(lit(1)).as("active"),
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("new"),
        sum(when(col("status") === "returning", 1L).otherwise(0L))
          .as("returning"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L))
          .as("resurrected"))
  }
}
