package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("hash sample is deterministic and near the requested rate") {
    val df = (1 to 10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 51).as[Int].collect().toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 51)
      .as[Int].collect().toSet
    assert(a == b) // partition-layout independent
    val rate = a.size / 10000.0
    assert(rate > 0.15 && rate < 0.25, s"rate $rate")
  }

  test("thresholds 0 and 256 are empty / full") {
    val df = (1 to 100).toDF("id")
    assert(Sampling.hashSample(df, "id", 0).count() == 0)
    assert(Sampling.hashSample(df, "id", 256).count() == 100)
  }

  test("stratified rates apply per stratum") {
    val df = (1 to 4000).map(i => (i, if (i % 2 == 0) "big" else "small"))
      .toDF("id", "src")
    val sampled = Sampling.stratifiedHashSample(df, "id", "src",
      Map("big" -> 26), defaultThreshold256 = 128)
    val counts = sampled.groupBy($"src").count()
      .as[(String, Long)].collect().toMap
    assert(counts("big") < 400)            // ~10% of 2000
    assert(counts("small") > 800)          // ~50% of 2000
  }
}

class KmeansIterSpec extends SparkTestBase {
  import spark.implicits._

  test("one Lloyd step: means move toward cluster members") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.8f, 0.2f)),   // cluster around x
      (2L, Array(0f, 1f)), (3L, Array(0.2f, 0.8f))    // cluster around y
    ).toDF("vec_id", "embedding")
    val cents = vecs.where($"vec_id".isin(0L, 2L))
    val got = Similarity.kmeansIter(vecs, cents, "vec_id", "embedding")
      .select($"centroid_id", $"pos", $"mean", $"n_members")
      .as[(Long, Int, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((0L, 1)) == (0.9, 2L))   // mean of 1.0, 0.8
    assert(got((0L, 2)) == (0.1, 2L))
    assert(got((2L, 1)) == (0.1, 2L))
    assert(got((2L, 2)) == (0.9, 2L))
  }
}
