package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntervalUnionAggSpec extends SparkTestBase {
  import spark.implicits._

  /** brute-force gap-merge of sorted intervals */
  private def brute(iv: Seq[(Long, Long)], gap: Long): Seq[(Long, Long, Long)] =
    iv.sortBy(x => (x._1, x._2))
      .foldLeft(Vector.empty[(Long, Long, Long)]) { case (acc, (s, e)) =>
        acc.lastOption match {
          case Some((ps, pe, pn)) if s <= pe + gap =>
            acc.init :+ ((ps, math.max(pe, e), pn + 1))
          case _ => acc :+ ((s, e, 1L))
        }
      }

  test("aggregator matches brute-force merge regardless of input order") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 60) {
      val gap = Seq(0L, 5L, 50L)(trial % 3)
      val iv = Seq.fill(1 + rnd.nextInt(60)) {
        val s = rnd.nextLong(500); (s, s + rnd.nextLong(30))
      }
      val shuffled = rnd.shuffle(iv)
      val agg = new IntervalUnionAgg(gap)
      val fromList = shuffled.map { case (s, e) => Iv(s, e, 1L) }
        .foldLeft(agg.zero)(agg.reduce)
      // split + merge path (simulates map-side partials)
      val (l, r) = shuffled.splitAt(shuffled.size / 2)
      val p1 = l.map { case (s, e) => Iv(s, e, 1L) }.foldLeft(agg.zero)(agg.reduce)
      val p2 = r.map { case (s, e) => Iv(s, e, 1L) }.foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(p1, p2)
      val expect = brute(iv, gap).map { case (s, e, n) => Iv(s, e, n) }
      assert(agg.finish(fromList) == expect, s"trial $trial (reduce)")
      assert(agg.finish(merged) == expect, s"trial $trial (merge)")
    }
  }

  test("works as a DataFrame UDAF and merges within gap") {
    val events = Seq((1L, 10L), (1L, 20L), (1L, 2000L), (2L, 5L))
      .toDF("user_id", "t")
    val iu = udaf(new IntervalUnionAgg(1800L))
    val got = events
      .groupBy($"user_id")
      .agg(iu($"t", $"t", lit(1L)).as("ivs"))
      .select($"user_id", explode($"ivs").as("iv"))
      .select($"user_id", $"iv.start".as("s"), $"iv.end".as("e"),
              $"iv.n".as("n"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 20L, 2L), (1L, 2000L, 2000L, 1L),
                      (2L, 5L, 5L, 1L)))
  }
}
