package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ReservoirAggSpec extends SparkTestBase {
  import spark.implicits._

  test("result is independent of input order and partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 5000).map(i =>
      ("k" + (i % 3), rnd.nextLong(), rnd.nextDouble()))
    val ra = udaf(ReservoirAgg(64))
    def run(shuffleSeed: Int, parts: Int) = {
      val df = new scala.util.Random(shuffleSeed).shuffle(rows)
        .toDF("k", "h", "v").repartition(parts)
      df.groupBy(col("k")).agg(ra(col("h"), col("v")).as("s"))
        .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq
    }
    assert(run(1, 2) == run(2, 7))
    assert(run(1, 2) == run(3, 1))
  }

  test("keeps exactly the k smallest (hash, value) pairs, values sorted") {
    val rows = (1 to 200).map(i => ("k", (200 - i).toLong, i.toDouble))
    val ra = udaf(ReservoirAgg(10))
    val got = rows.toDF("k", "h", "v").repartition(4)
      .groupBy(col("k")).agg(ra(col("h"), col("v")).as("s"))
      .collect().head.getSeq[Double](1)
    // smallest 10 hashes are h=0..9 <-> v=200..191; finish sorts values
    assert(got == (191 to 200).map(_.toDouble))
  }

  test("group smaller than k returns the whole group") {
    val ra = udaf(ReservoirAgg(100))
    val got = Seq(("k", 3L, 1.0), ("k", 1L, 2.0)).toDF("k", "h", "v")
      .groupBy(col("k")).agg(ra(col("h"), col("v")).as("s"))
      .collect().head.getSeq[Double](1)
    assert(got == Seq(1.0, 2.0))
  }

  test("reservoirQuantiles estimates land near exact percentiles") {
    // 100k uniform(0,1) values, k=256: quantile SE ~ sqrt(q(1-q)/k)
    // ~ 0.031 at the median; assert within 4 SE
    val rnd = new scala.util.Random(11)
    val df = (1 to 100000).map { i =>
      ("k", rnd.nextLong(), rnd.nextDouble())
    }.toDF("k", "h", "v")
    val est = graft.operators.Stats.reservoirQuantiles(df, Seq("k"),
        "h", "v", Seq(("p50", 0.5)), k = 256)
      .collect().head.getAs[Double]("p50")
    assert(math.abs(est - 0.5) < 0.13, s"p50 estimate $est")
  }
}
