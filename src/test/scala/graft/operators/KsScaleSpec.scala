package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Parity of the range-bucketed prefix forms (`orderBuckets > 1`) of
  * [[Stats.ksTest]] and [[Stats.sweepConcurrency]] against their
  * single-window defaults: the bucketed route is the 100 TB shape (no
  * unpartitioned window over the distinct-value/-time table), and it
  * must be bit-identical — the statistic is exact integer arithmetic,
  * so any divergence is a protocol bug, not noise.
  */
class KsScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("ksTest: bucketed prefix matches the single-window default") {
    val rnd = new scala.util.Random(17)
    // two deliberately different distributions + heavy ties
    val rows = (1 to 20000).map { i =>
      val g = if (i % 2 == 0) "A" else "B"
      val v = if (g == "A") rnd.nextInt(500).toLong
              else (rnd.nextInt(500) + rnd.nextInt(60)).toLong
      (v, g)
    }
    val df = rows.toDF("v", "g")
    for (buckets <- Seq(2, 8, 64)) {
      val plain = Stats.ksTest(df, "v", "g", "A", "B").collect().head
      val bucketed = Stats.ksTest(df, "v", "g", "A", "B",
        orderBuckets = buckets).collect().head
      assert(bucketed == plain, s"orderBuckets=$buckets")
    }
  }

  test("ksTest bucketed plan has no unpartitioned window") {
    val df = (1 to 1000).map(i =>
      (i.toLong % 97, if (i % 2 == 0) "A" else "B")).toDF("v", "g")
    val p = Stats.ksTest(df, "v", "g", "A", "B", orderBuckets = 16)
      .queryExecution.executedPlan.toString
    // every Window must carry a partition spec (the _ob bucket); an
    // empty windowspecdefinition() would be the single-task sort the
    // bucketed form exists to remove
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition"))
      .toSeq
    assert(winLines.forall(_.contains("_ob")),
      s"bucketed KS must window inside range buckets only:\n$winLines")
  }

  test("sweepConcurrency: bucketed prefix matches the single-window default") {
    val rnd = new scala.util.Random(23)
    val iv = (1 to 5000).map { _ =>
      val s = rnd.nextInt(100000).toLong
      (s, s + 1 + rnd.nextInt(5000))
    }.toDF("s", "e")
    for (buckets <- Seq(2, 16)) {
      val plain = Stats.sweepConcurrency(iv, "s", "e")
        .orderBy(col("t")).collect().toSeq
      val bucketed = Stats.sweepConcurrency(iv, "s", "e",
          orderBuckets = buckets)
        .select(col("t"), col("delta"), col("concurrency"))
        .orderBy(col("t")).collect().toSeq
      assert(bucketed == plain, s"orderBuckets=$buckets")
    }
  }
}
