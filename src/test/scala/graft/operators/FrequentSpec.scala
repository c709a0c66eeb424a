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

  test("sequenceSupport counts contiguous n-grams per stream") {
    import org.apache.spark.sql.functions.col
    // user 1: a b a b a → (a,b,a)×2, (b,a,b)×1; user 2: a b a → (a,b,a)
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
        (1L, 4L, "b"), (1L, 5L, "a"),
        (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "a"))
      .toDF("u", "t", "e")
    val got = Stats.sequenceSupport(ev, "u", Seq(col("t")), "e",
        n = 3, minSupport = 1L)
      .as[(String, String, String, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(got == Map(("a", "b", "a") -> 3L, ("b", "a", "b") -> 1L))
    // support cut; streams shorter than n emit nothing
    val cut = Stats.sequenceSupport(ev, "u", Seq(col("t")), "e", 3, 2L)
      .as[(String, String, String, Long)].collect()
    assert(cut.toSeq == Seq(("a", "b", "a", 3L)))
    val short = Stats.sequenceSupport(
      Seq((9L, 1L, "x"), (9L, 2L, "y")).toDF("u", "t", "e"),
      "u", Seq(col("t")), "e", 3, 1L)
    assert(short.count() == 0)
    // n = 2 pairs come from the same machinery
    val pairs = Stats.sequenceSupport(ev, "u", Seq(col("t")), "e", 2, 1L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs == Map(("a", "b") -> 3L, ("b", "a") -> 3L))
  }
}
