package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data profiling — the "know your corpus before you train on
  * it" report: per-column null count, distinct count, min / max /
  * mean, emitted long-format (one row per column) so downstream checks
  * join against thresholds.
  *
  * Scale shape: ONE aggregate over ONE scan — but the distinct count
  * has two modes with very different physical plans:
  *
  *  - '''exact''' (`approx = false`): multiple exact count-distincts
  *    make Catalyst plan an Expand — one input row becomes
  *    #distinct-aggs+1 rows pre-shuffle, i.e. the scan is effectively
  *    multiplied N_cols×. Correct, oracle-checkable, and the wrong
  *    default shape at 100 TB.
  *  - '''approx''' (`approx = true`): `approx_count_distinct`
  *    (HyperLogLog++, relative error `rsd`) is an ordinary partial/
  *    final aggregate buffer — NO Expand, the scan is read once
  *    regardless of column count. This is the scale default; the plan
  *    shape is spec-pinned Expand-free.
  *
  * The wide single-row aggregate is reshaped to long form with one
  * literal-array explode on a ONE-ROW frame — no second pass over data.
  */
object Profile {

  /** The shared wide→long scaffold every report in this file rides:
    * run `aggs` as ONE aggregate over ONE scan, then reshape the
    * resulting ONE-ROW frame with a literal-array explode of one
    * `groups` struct per output row. Any fix to the reshape (column
    * escaping, the one-row explode shape) lands once, here.
    */
  private def aggExplode(df: DataFrame, aggs: Seq[Column],
                         groups: Seq[Column]): DataFrame =
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(groups: _*)).as("_s"))
      .select(col("_s.*"))

  /** Long-format numeric profile of `cols`:
    * (column, n_nulls, n_distinct, min_v, max_v, avg_v), one row per
    * profiled column, values rounded to 6 places for engine-exact
    * comparison. `approx = true` swaps the exact distinct count for
    * HyperLogLog++ (see class doc — the 100 TB mode; n_distinct then
    * carries the estimate and the result is rows-checked, not
    * hash-checked, against an oracle).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String],
                     approx: Boolean = false,
                     rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        (if (approx) approx_count_distinct(col(c), rsd)
         else countDistinct(col(c))).as(s"${c}__nd"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"),
        round(avg(col(c)), 6).as(s"${c}__avg"))
    }
    aggExplode(df, aggs, cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__avg").as("avg_v"))
    })
  }

  /** [[profileNumeric]]'s VALIDATION form: the exact profile plus the
    * HLL++ estimate's error check, in ONE aggregate over ONE scan —
    * (column, n_nulls, n_distinct, nd_ok, min_v, max_v, avg_v) where
    * `n_distinct` is exact and `nd_ok` asserts
    * |HLL − exact| ≤ max(relErr·exact, absErr) (defaults: 3·rsd with
    * rsd = 0.05, and an absolute floor for tiny cardinalities). Costs
    * what the exact profile costs (the multi-distinct Expand — see
    * class doc); the HLL rides the same aggregate for free. This is
    * the oracle surface for the approx mode: DuckDB computes the exact
    * columns and asserts nd_ok TRUE, so an estimate outside its bound
    * hash-mismatches.
    *
    * TWO aggregate passes by design, joined on the (N_cols-row)
    * profile: fusing the HLL into the exact aggregate looks cheaper
    * (one scan) but Spark's multi-distinct rewrite then merges an HLL
    * buffer per DISTINCT VALUE through the Expand — measured 5.2 s vs
    * this form's 2.3 s at sf0.1 (the same per-distinct-buffer
    * pathology as mixing countDistinct with percentile_approx in one
    * agg). Two scans of a columnar source are the cheap part; sketch
    * buffers per distinct value are not.
    */
  def profileNumericValidated(df: DataFrame, cols: Seq[String],
                              rsd: Double = 0.05,
                              relErr: Double = 0.15,
                              absErr: Double = 16.0): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val est = profileNumeric(df, cols, approx = true, rsd = rsd)
      .select(col("column"), col("n_distinct").as("_nd_est"))
    profileNumeric(df, cols)
      .join(broadcast(est), Seq("column"))
      .select(col("column"), col("n_nulls"), col("n_distinct"),
        (abs(col("_nd_est") - col("n_distinct")) <=
          greatest(col("n_distinct") * relErr, lit(absErr))).as("nd_ok"),
        col("min_v"), col("max_v"), col("avg_v"))
  }

  /** Long-format STRING profile of `cols`: (column, n_nulls, n_empty,
    * n_distinct, min_len, max_len, avg_len), one row per column —
    * the text twin of [[profileNumeric]] (a corpus report needs both).
    * Same scale shape: one aggregate, one scan, the same exact-vs-
    * approx distinct trade (`approx = true` for the Expand-free 100 TB
    * plan). Lengths are in characters; avg_len rounded to 6 places,
    * NULLs excluded from length stats (ANSI aggregate semantics both
    * engines share).
    */
  def profileString(df: DataFrame, cols: Seq[String],
                    approx: Boolean = false,
                    rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        count(when(col(c) === "", lit(1))).as(s"${c}__empty"),
        (if (approx) approx_count_distinct(col(c), rsd)
         else countDistinct(col(c))).as(s"${c}__nd"),
        min(length(col(c))).cast("long").as(s"${c}__minl"),
        max(length(col(c))).cast("long").as(s"${c}__maxl"),
        round(avg(length(col(c))), 6).as(s"${c}__avgl"))
    }
    aggExplode(df, aggs, cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__empty").as("n_empty"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__minl").as("min_len"),
        col(s"${c}__maxl").as("max_len"),
        col(s"${c}__avgl").as("avg_len"))
    })
  }

  /** Declarative data-quality CONSTRAINT CHECKS — the expectations gate
    * a pipeline runs before shipping a table: each named constraint is
    * a boolean Column; a row VIOLATES it when the predicate is not TRUE
    * (NULL counts as a violation — an unknown quality bit fails the
    * gate, it doesn't pass it). Returns long format
    * (constraint, n_rows, n_violations, passed), one row per
    * constraint.
    *
    * Scale shape: ALL constraints evaluate in ONE aggregate over ONE
    * scan (each is a conditional count — map-side combined, no Expand,
    * no per-constraint pass); the long reshape is a literal-array
    * explode on a one-row frame. Adding a constraint costs one more
    * aggregate buffer, never another scan.
    */
  def checkConstraints(df: DataFrame,
                       constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    val aggs = count(lit(1)).as("__n") +: constraints.map {
      case (name, pred) =>
        count(when(!coalesce(pred, lit(false)), lit(1))).as(s"${name}__v")
    }
    aggExplode(df, aggs, constraints.map { case (name, _) =>
      struct(
        lit(name).as("constraint"),
        col("__n").as("n_rows"),
        col(s"${name}__v").as("n_violations"),
        (col(s"${name}__v") === 0L).as("passed"))
    })
  }

  /** MERGEABLE distinct-count sketches (Apache DataSketches HLL, the
    * engine-native `hll_sketch_agg` family): one row per stratum with
    * its estimated distinct `valueCol` count, plus a `__all__` row
    * whose estimate comes from UNIONING the per-stratum sketches — not
    * from re-scanning the data. That union IS the operator's point:
    * sketches persisted per partition/day can answer any-window
    * cardinality later by merge alone, the incremental-maintenance
    * shape [[Snapshot.mergeAggregates]] gives exact aggregates,
    * extended to DISTINCT (which has no exact mergeable form at all —
    * only the ~1.5 KB sketch buffer makes 100 TB distinct-maintenance
    * possible).
    *
    * Approximate by nature (driver check is rows-only; the error bound
    * vs exact is spec-tested, q34's contract). Deterministic: HLL
    * register updates are order-independent (max per bucket), so the
    * same data gives the same estimate on any partitioning.
    */
  def mergeableDistinct(df: DataFrame, strataCol: String,
                        valueCol: String): DataFrame = {
    // per-stratum sketches feed both the per-stratum estimates and the
    // global union — pinned (ContextCleaner-scoped), not persisted into
    // the session CacheManager that nothing ever releases
    val sk = Components.pin(
      df.groupBy(col(strataCol).cast("string").as("stratum"))
        .agg(hll_sketch_agg(col(valueCol)).as("_sk")),
      reliable = false)
    val per = sk.select(col("stratum"),
      hll_sketch_estimate(col("_sk")).as("n_distinct_est"))
    val all = sk.agg(hll_union_agg(col("_sk")).as("_u"))
      .select(lit("__all__").as("stratum"),
        hll_sketch_estimate(col("_u")).as("n_distinct_est"))
    per.unionByName(all)
  }
}
