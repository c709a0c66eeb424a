package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval intersection — the reference's exome `bedtools intersect`.
  *
  * Reference semantics (`program/src/main/scala/hmushtaq/sparkga1/
  * SparkGA1.scala:657-732`): intersect a small exome BED with each region's
  * BED via shell-out; degenerate zero-length intervals are widened by one
  * (`SparkGA1.scala:692-695`).
  *
  * Spark-native: an overlap join `a.start <= b.end && b.start <= a.end`
  * (half-open or closed per flag). With a small side it's a
  * BroadcastNestedLoopJoin — fine. For two LARGE interval sets a pure theta
  * join is quadratic per key; `bucketedOverlapJoin` turns it into an
  * equi-join on (key, coarse-bucket) + residual range predicate, which
  * Catalyst executes as a shuffled hash/sort-merge join — the 100 TB path.
  */
object RangeJoin {

  /** Fix degenerate intervals: `start == end` → `end + 1`
    * (SparkGA1.scala:692-695 semantics).
    */
  def fixDegenerate(df: DataFrame, startCol: String, endCol: String)
      : DataFrame =
    df.withColumn(endCol,
      when(col(startCol) === col(endCol), col(endCol) + 1)
        .otherwise(col(endCol)))

  /** Overlap predicate for closed intervals [s, e]. */
  def overlaps(aStart: Column, aEnd: Column, bStart: Column, bEnd: Column)
      : Column = aStart <= bEnd && bStart <= aEnd

  /** Broadcast overlap join: `small` is broadcast; result carries all
    * columns of both (caller projects). Same-named key columns must be
    * pre-renamed by the caller.
    */
  def broadcastOverlapJoin(big: DataFrame, small: DataFrame,
                           bigKey: String, smallKey: String,
                           bigStart: String, bigEnd: String,
                           smallStart: String, smallEnd: String): DataFrame =
    big.join(broadcast(small),
      big(bigKey) === small(smallKey) &&
        overlaps(big(bigStart), big(bigEnd),
                 small(smallStart), small(smallEnd)))

  /** Scale path for big-big overlap joins: explode each left interval into
    * the coarse buckets it touches, equi-join on (key, bucket), keep the
    * residual overlap predicate, and dedupe pairs that matched in more than
    * one bucket by crediting the match to the first shared bucket.
    * Shuffle is hash on (key, bucket) — no cartesian blow-up.
    */
  def bucketedOverlapJoin(left: DataFrame, right: DataFrame,
                          keyCols: Seq[String],
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bucketWidth: Long): DataFrame = {
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bkt",
        explode(sequence(
          floor(col(s).cast("double") / bucketWidth).cast("long"),
          floor(col(e).cast("double") / bucketWidth).cast("long"))))
    val l = explodeBuckets(left, lStart, lEnd)
    val r = explodeBuckets(right, rStart, rEnd)
    l.join(r, keyCols :+ "_bkt")
      .where(overlaps(col(lStart), col(lEnd), col(rStart), col(rEnd)))
      // credit each matched pair to one bucket: the bucket holding the
      // later of the two starts (always shared by both intervals).
      .where(col("_bkt") ===
        floor(greatest(col(lStart), col(rStart)).cast("double") / bucketWidth)
          .cast("long"))
      .drop("_bkt")
  }
}
