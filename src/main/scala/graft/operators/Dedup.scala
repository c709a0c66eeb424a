package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication — the reference's `distinct` gather + MarkDuplicates.
  *
  * Reference: Part 3's `vcf.distinct` removes identical variant lines
  * re-emitted at region boundaries (`program/src/main/scala/hmushtaq/
  * sparkga1/SparkGA1.scala:1241`); Picard MarkDuplicates (shelled out at
  * `SparkGA1.scala:822-851`) is the domain-level first-per-key dedup.
  *
  * Spark-native: `distinct`/`dropDuplicates` for exact row dedup (one
  * shuffle, hash agg); window `row_number() == 1` for keep-best-per-key.
  * At scale prefer `firstPerKey` over `dropDuplicates(keys)` when you need
  * a *deterministic* winner — dropDuplicates keeps an arbitrary row.
  */
object Dedup {

  /** Keep exactly one row per key: the first under (orderCols) ordering.
    * orderCols must total-order rows within a key for determinism.
    * ≈ MarkDuplicates keep-highest-quality-read.
    */
  def firstPerKey(df: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Exact duplicate groups report: keys occurring > 1 time.
    * (the "duplicates marked" view rather than the deduped view)
    */
  def duplicateGroups(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)
}
