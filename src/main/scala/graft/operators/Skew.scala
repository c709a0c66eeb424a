package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-aware repartitioning — the reference's hot-region splitting.
  *
  * Reference semantics: a region holding more than the average number of
  * reads is split into `segments = round(reads * factor / avg)`
  * equal-frequency sub-partitions (`program/src/main/scala/hmushtaq/sparkga1/
  * SparkGA1.scala:242,267`), with boundaries from an exact sorted-position
  * histogram + binary search (`SparkGA1.scala:346-353,405-418,550-570`).
  *
  * Spark-native: AQE already splits skewed *shuffle* partitions at runtime;
  * these helpers cover the cases AQE doesn't — groupBy-skew via two-level
  * salted aggregation, and explicit equal-frequency sub-bucketing via
  * `ntile` (exact, matches the reference's histogram semantics) or
  * `percentile_approx` boundaries (the 100 TB path: no full sort of the hot
  * key's rows, one sketch pass).
  */
object Skew {

  /** `segments = max(1, round(n * factor / avg))` — SparkGA1.scala:242.
    *
    * NOTE: the global average is computed EAGERLY (`.head` — one scalar
    * aggregation job at operator-build time, same deliberate pattern as
    * Similarity.ivfAssign's centroid collect). `counts` is a per-key
    * aggregate, so the job scans #keys rows, not the data; a fully lazy
    * formulation would need a cross join against the 1-row average,
    * which costs the same work with worse ergonomics.
    */
  def segmentCounts(counts: DataFrame, keyCols: Seq[String],
                    countCol: String, factor: Double): DataFrame = {
    val row = counts.agg(avg(col(countCol))).head()
    // empty input (or all-NULL counts): avg is NULL — any divisor works,
    // the result has no rows (or segments=1 for NULL-count rows)
    val avgCount = if (row.isNullAt(0)) 1.0 else row.getDouble(0)
    counts.withColumn("segments",
      greatest(round(col(countCol) * factor / avgCount).cast("int"), lit(1)))
  }

  /** Exact equal-frequency split: `ntile(n)` per key partition, total
    * ordering given by `orderCols` (include a unique tie-break for
    * determinism). Matches the reference's exact-histogram split.
    */
  def ntileSplit(df: DataFrame, keyCols: Seq[String], n: Int,
                 orderCols: Seq[String],
                 segCol: String = "segment"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    df.withColumn(segCol, ntile(n).over(w))
  }

  /** Salted two-level aggregation: groupBy(key, salt) partial → groupBy(key)
    * final. Equivalent to plain groupBy(key).agg(sum, count) but the first
    * shuffle spreads a hot key over `saltBuckets` reducers. Use when one key
    * dominates (the reference's hot chromosome region).
    *
    * `aggs` maps output column name -> (sum-able input column). The helper
    * re-aggregates sums and counts correctly across salt buckets.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltBuckets: Int): DataFrame = {
    val key = keyCols.map(col)
    // deterministic salt (hash of all columns mod buckets) — not rand(), so
    // retried tasks re-produce identical partials.
    val salt = pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltBuckets))
    df.withColumn("_salt", salt)
      .groupBy((key :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(key: _*)
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n_rows"))
  }

  /** Salted join for a skewed equi-join that can't broadcast: the big
    * (skewed) side gets a deterministic salt 0..buckets-1 appended to its
    * key; the small-but-not-broadcastable side is replicated once per
    * salt value. The hot key's rows then land on `buckets` reducers
    * instead of one. AQE's skew-join handles sort-merge spills at
    * runtime; explicit salting is for when you know the hot keys up
    * front and want the first shuffle balanced too.
    *
    * SALT-CHOICE CAVEAT: the salt is `hash(ALL big-side columns) %
    * buckets` — deterministic by design (retried tasks re-produce
    * identical output; `rand()` would not). The price: big-side rows
    * that are fully identical (true duplicates of a hot key) hash to
    * ONE salt bucket and still land on one reducer. That is the right
    * trade for exactly-reproducible results; if the skew is literal
    * row duplication, either dedup-with-counts first (aggregate the
    * duplicates away, join, re-expand) or salt on a row-unique column
    * (offset, file position) when the schema carries one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, on: Seq[String],
                 saltBuckets: Int): DataFrame = {
    val salts = explode(array((0 until saltBuckets).map(lit): _*))
    val bigSalted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)))
    val smallReplicated = small.withColumn("_salt", salts)
    bigSalted.join(smallReplicated, on :+ "_salt").drop("_salt")
  }

  /** Approximate equal-frequency boundaries per key for the no-full-sort
    * scale path: returns (key..., boundaries: array) where boundaries are
    * the (1/n .. (n-1)/n) quantiles of `posCol`.
    */
  def approxBoundaries(df: DataFrame, keyCols: Seq[String], posCol: String,
                       n: Int, accuracy: Int = 10000): DataFrame = {
    val probs = (1 until n).map(i => i.toDouble / n)
    df.groupBy(keyCols.map(col): _*)
      .agg(percentile_approx(col(posCol),
        array(probs.map(lit): _*), lit(accuracy)).as("boundaries"))
  }

  /** Assign segment by searching approx boundaries (width_bucket-style):
    * segment = 1 + #boundaries below pos. Codegen'd array expression —
    * no UDF, no sort. The boundary lookup joins NULL-SAFELY on the key
    * columns, so NULL-key groups keep their segments (plain equality
    * would silently drop them — the same trap exactPercentiles hit).
    * A NULL pos lands in segment 1 (every comparison falls through).
    */
  def segmentByBoundaries(df: DataFrame, boundaries: DataFrame,
                          keyCols: Seq[String], posCol: String,
                          segCol: String = "segment"): DataFrame = {
    val b = boundaries.select(
      keyCols.map(c => col(c).as(s"_bk_$c")) :+ col("boundaries"): _*)
    // foldLeft, not reduce: keyCols may be EMPTY (global boundaries —
    // the quantileBin path), where the lookup is a pure one-row cross
    val cond = keyCols.map(c => col(c) <=> col(s"_bk_$c"))
      .foldLeft(lit(true))(_ && _)
    df.join(broadcast(b), cond)
      .withColumn(segCol,
        lit(1) + aggregate(col("boundaries"), lit(0),
          (acc, bd) => acc + when(col(posCol) > bd, 1).otherwise(0)))
      .drop(keyCols.map(c => s"_bk_$c") :+ "boundaries": _*)
  }
}
