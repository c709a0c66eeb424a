package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event (survival) analysis over right-censored subject
  * tables — "how long do users stay active", the churn curve every
  * retention review wants next to the cohort triangle (reference
  * lineage: the per-sample lifecycle tracking in
  * SparkGA1's per-chunk progress accounting, S/SparkGA1.scala —
  * re-expressed as the standard statistical estimator).
  */
object Survival {

  /** Kaplan–Meier survival curve per key: for each distinct duration t
    * with at least one event, the at-risk count n_t, the event count
    * d_t, and the product-limit estimate
    * {{{ S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) }}}
    * Input is ONE ROW PER SUBJECT: an integral `durationCol` (time
    * observed) and a boolean `eventCol` (true = the event happened at
    * that duration; false = right-censored there). Ties between events
    * and censorings at the same duration follow the standard
    * convention: censored subjects count as at-risk for that
    * duration's events (censoring happens "just after" the deaths).
    *
    * DETERMINISM: n_t and d_t are exact integers; S(t) is
    * exp(Σ ln(1 − d/n)) accumulated over a SORTED growing window, so
    * both engines add the same doubles in the same order (the q113
    * double-sum protocol); round(6) absorbs last-ulp libm noise. A
    * duration where everyone at risk dies (d = n) pins S to exactly 0
    * rather than routing ln(0) through the sum.
    *
    * SCALE SHAPE: one map-side-combined aggregate to (key, duration)
    * rows, a one-row-per-key totals broadcast, then two running
    * windows over the SAME per-key exchange (exclusive cum for the
    * at-risk count, inclusive cum for the log-survival). Everything
    * after the first aggregate is distinct-duration bound, not
    * subject bound.
    */
  def kaplanMeier(df: DataFrame, keyCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    val key = keyCols.map(col)
    val perT = df.groupBy(key :+ col(durationCol): _*)
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"),
        count(lit(1)).as("_n_at"))
    val totals = df.groupBy(key: _*).agg(count(lit(1)).as("_tot"))
    val wPrev = Window.partitionBy(key: _*).orderBy(col(durationCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRisk = perT
      .join(broadcast(totals), keyCols)
      .withColumn("n_risk",
        col("_tot") - coalesce(sum(col("_n_at")).over(wPrev), lit(0L)))
    val wCum = Window.partitionBy(key: _*).orderBy(col(durationCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val frac = col("n_events").cast("double") / col("n_risk").cast("double")
    withRisk
      .where(col("n_events") > 0)
      .withColumn("_dead_end",
        max(when(col("n_events") === col("n_risk"), 1).otherwise(0))
          .over(wCum))
      .withColumn("survival",
        when(col("_dead_end") === 1, lit(0.0)).otherwise(
          round(exp(sum(
            when(col("n_events") < col("n_risk"), log(lit(1.0) - frac))
              .otherwise(lit(0.0))).over(wCum)), 6)))
      .select(key ++ Seq(col(durationCol), col("n_risk"),
        col("n_events"), col("survival")): _*)
  }

  /** Time-weighted average of a stepwise value over validity
    * intervals: each row holds `valueCol` from `startCol` (inclusive)
    * to `endCol` (exclusive), and the per-key average weights each
    * value by its interval length — the correct mean for SCD2-style
    * "price was X from t1 to t2" tables, where a row-count average
    * over-weights short-lived values.
    *
    * EXACT: value goes through DECIMAL(18,4) (the moneySum protocol —
    * the one double→decimal convention proven to round identically
    * across engines on this surface) and the weight is the integral
    * interval length, so Σ v·w and Σ w are both exact and
    * order-independent; ONE division at the end, then round(6).
    * Zero-length intervals carry no weight; a key with only
    * zero-length intervals yields NULL.
    */
  def timeWeightedAvg(df: DataFrame, keyCols: Seq[String], startCol: String,
                      endCol: String, valueCol: String): DataFrame = {
    val w: Column = col(endCol) - col(startCol)
    val v = col(valueCol).cast("decimal(18,4)")
    // both sums are EXACT (decimal / integer); cast each to double and
    // divide ONCE — a decimal/decimal division would round at an
    // engine-chosen result scale (Spark and DuckDB pick different ones)
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(w).as("total_time"),
        when(sum(w) > 0,
          round(sum(v * w).cast("double") /
            sum(w).cast("double"), 6)).as("tw_avg"))
  }
}
