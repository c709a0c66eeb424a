package graft.operators

import graft.SparkTestBase

class FrequentSpec extends SparkTestBase {
  import spark.implicits._

  test("heavyHitters equals the direct group-by filter on skewed data") {
    // zipf-ish: item i carries ~2000/i occurrences, spread over 8
    // partitions so per-partition Misra–Gries summaries genuinely merge
    val rows = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"w$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("item")
    val k = 20
    val got = Frequent.heavyHitters(df, "item", k)
      .as[(String, Long)].collect().toMap
    val n = rows.size
    val want = rows.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
      .filter { case (_, c) => c * k > n }
    assert(got == want, s"got $got want $want")
    assert(got.nonEmpty, "fixture must actually contain heavy hitters")
  }

  test("no heavy hitters when mass is uniform") {
    val df = spark.sparkContext
      .parallelize((1 to 1000).map(i => s"u$i"), 4).toDF("item")
    assert(Frequent.heavyHitters(df, "item", 50).count() == 0)
  }

  test("single dominant item survives any partitioning") {
    val rows = Seq.fill(500)("hot") ++ (1 to 500).map(i => s"cold$i")
    val df = spark.sparkContext.parallelize(rows, 7).toDF("item")
    val got = Frequent.heavyHitters(df, "item", 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 500L))
  }
}
