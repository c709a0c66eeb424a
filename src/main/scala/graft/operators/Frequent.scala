package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters — items with frequency > N/k — via
  * per-partition Misra–Gries summaries + an exact recount of the
  * surviving candidates.
  *
  * Why not a plain groupBy-count-filter: that shuffles EVERY distinct
  * item (at corpus scale, the token/URL/fingerprint universe), when
  * only the ≤ k heavy survivors matter. Here the shuffle carries at
  * most k candidate items per partition, independent of the item
  * universe; the exact pass then counts ONLY candidates via a
  * broadcast semi-join running in the scan stage.
  *
  * Correctness: a Misra–Gries summary with k counters over a partition
  * of n_p rows retains every item whose partition count exceeds
  * n_p/(k+1). If a global count exceeds N/k > N/(k+1), then by
  * pigeonhole some partition holds count_p > n_p/(k+1), so every true
  * heavy hitter survives pass 1 (the summary may also emit false
  * candidates — pass 2's exact counts eliminate them). The final
  * output is therefore EXACT — identical to the direct group-by — and
  * oracle-checkable, unlike a sketch.
  */
object Frequent {

  /** Items of `itemCol` (as string) with count(item) · k > count(*),
    * i.e. frequency strictly above N/k. Output: (item, freq), exact.
    */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, "heavy hitters need k >= 2")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
    // pass 1: Misra–Gries per partition — k counters; a full summary
    // meeting a new item decrements ALL counters (absorbing k+1 distinct
    // occurrences), dropping the zeroed ones. Amortized O(1) per row.
    val cands = items.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counts.get(x) match {
          case Some(c) => counts(x) = c + 1
          case None if counts.size < k => counts(x) = 1L
          case None =>
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            counts.foreach { case (key, c) =>
              if (c == 1L) dead += key else counts(key) = c - 1
            }
            dead.foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("item").distinct()
    // pass 2: exact recount of candidates only (scan-stage broadcast
    // semi-join; nothing item-universe-sized ever shuffles), then the
    // exact threshold from a one-row broadcast total.
    val total = items.agg(count(lit(1)).as("_n"))
    items
      .join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .where(col("freq") * k > col("_n"))
      .select(col("item"), col("freq"))
  }
}
