package graft.streaming

import graft.SparkTestBase
import graft.operators.Funnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Out-of-order funnel contract: [[StatefulFunnel.trackUnordered]]'s
  * final revisions must reproduce the batch `Funnel.conversion` counts
  * under ARBITRARY cross-batch delivery order — including the two cases
  * an in-order tracker gets wrong:
  *  - a missing middle step arriving after later steps (advance);
  *  - an earlier anchor arriving late, shifting the window left and
  *    expelling a previously counted completion (retraction).
  */
class StatefulFunnelSpec extends SparkTestBase {
  import spark.implicits._
  import StatefulFunnel.{FunnelRev, StepEvent}

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private val steps = Seq("view", "click", "purchase")
  private val windowSec = 100L

  /** Final reached-count per key from the revision log. */
  private def finalCounts(table: String): Map[Int, Long] = {
    val fin = spark.table(table)
      .groupBy(col("key"))
      .agg(max_by(col("reached"), col("rev")).as("reached"))
      .where(col("reached") >= 1)
    fin.select(explode(sequence(lit(1), col("reached"))).as("step_idx"))
      .groupBy(col("step_idx")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
  }

  private def batchCounts(evs: Seq[(Long, Long, Int)]): Map[Int, Long] =
    Funnel.conversion(
        evs.map { case (k, t, s) => (k, ts(t), steps(s)) }
          .toDF("user_id", "ts_t", "event_type"),
        "user_id", "ts_t", "event_type", steps, windowSec)
      .select(col("step_idx"), col("n_users"))
      .as[(Int, Long)].collect().toMap
      .filter(_._2 > 0)

  private def drainShuffled(name: String,
                            batches: Seq[Seq[(Long, Long, Int)]])
      : Unit = {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[StepEvent]
    val out = StatefulFunnel.trackUnordered(in.toDS(), steps.length,
      windowSec)
    val q = out.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        in.addData(b.map { case (k, t, s) => StepEvent(k, ts(t), s) })
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("shuffled micro-batches match the batch funnel (advance + " +
      "retraction cases)") {
    // key 1: clean in-window conversion, delivered fully reversed
    // key 2: middle step arrives LAST (advance on late data)
    // key 3: anchor arrives LAST and earlier than everything — the
    //        window shifts left and expels the purchase@150 completion
    //        (retraction); click@20 still lands in (0, 100]
    // key 4: step-2 events both before the (late) anchor and past the
    //        shifted window — candidates below the resolution must have
    //        been kept for 30 to be chosen over the expelled 150
    val all = Seq(
      (1L, 10L, 0), (1L, 20L, 1), (1L, 30L, 2),
      (2L, 10L, 0), (2L, 40L, 2), (2L, 20L, 1),
      (3L, 60L, 0), (3L, 70L, 1), (3L, 150L, 2), (3L, 0L, 0), (3L, 20L, 1),
      (4L, 5L, 1), (4L, 30L, 1), (4L, 150L, 2), (4L, 10L, 0))
    val batches = Seq(
      Seq(all(2), all(5), all(8)),            // late steps first
      Seq(all(1), all(4), all(7), all(11), all(12)),
      Seq(all(0), all(3), all(6), all(13)),
      Seq(all(9), all(10)),                   // key 3's early anchor last
      Seq(all(14)))                           // key 4's anchor last
    drainShuffled("funnel_shuffled", batches)
    val got = finalCounts("funnel_shuffled")
    val want = batchCounts(all)
    assert(got == want, s"streaming $got vs batch $want")
    // the retraction really happened: key 3 must sit at 2 steps, not 3
    val k3 = spark.table("funnel_shuffled")
      .where(col("key") === 3L)
      .orderBy(col("rev")).select(col("reached"))
      .as[Int].collect().toSeq
    assert(k3.last == 2 && k3.contains(3),
      s"key 3 should have been counted at 3 steps then retracted: $k3")
  }

  test("in-order delivery emits one revision per user and matches batch") {
    val all = Seq(
      (10L, 10L, 0), (10L, 20L, 1), (10L, 30L, 2),
      (11L, 10L, 0), (11L, 15L, 1),
      (12L, 10L, 2), (12L, 20L, 1)) // never sees step 1 → no revisions
    drainShuffled("funnel_inorder", Seq(all))
    assert(finalCounts("funnel_inorder") == batchCounts(all))
    assert(spark.table("funnel_inorder")
      .groupBy(col("key")).agg(max(col("rev")).as("r"))
      .as[(Long, Int)].collect().toMap.values.forall(_ == 1))
  }
}
