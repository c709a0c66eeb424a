package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the round-7 exact-arithmetic operators: largest-remainder
  * allocation, Markov transitions, LOCF gap fill, Pareto coverage.
  */
class AllocateStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("largestRemainder: allocations sum back to the total exactly") {
    // 100 split 1:1:1 → 34/33/33 with the extra unit on the smallest
    // tie-break; 7 split 2:3 → 3/4 (remainders 4/5 and 1/5)
    val df = Seq(
      ("a", 1, 1L, 100L), ("a", 2, 1L, 100L), ("a", 3, 1L, 100L),
      ("b", 1, 2L, 7L), ("b", 2, 3L, 7L)
    ).toDF("grp", "line", "w", "total")
    val got = Allocate.largestRemainder(df, Seq("grp"), "w", "total",
        Seq("line"))
      .select(col("grp"), col("line"), col("alloc"))
      .as[(String, Int, Long)].collect()
      .map { case (g, l, a) => (g, l) -> a }.toMap
    assert(got == Map(("a", 1) -> 34L, ("a", 2) -> 33L, ("a", 3) -> 33L,
      ("b", 1) -> 3L, ("b", 2) -> 4L))
  }

  test("largestRemainder: exact-proportion split needs no correction") {
    val df = Seq(("g", 1, 2L, 10L), ("g", 2, 3L, 10L))
      .toDF("grp", "line", "w", "total")
    val got = Allocate.largestRemainder(df, Seq("grp"), "w", "total",
        Seq("line"))
      .select(col("line"), col("alloc")).as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 4L, 2 -> 6L))
  }

  test("largestRemainder: sum invariant on random groups") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 50).flatMap { g =>
      val n = 1 + rng.nextInt(6)
      val total = 100L + rng.nextInt(100000).toLong
      (1 to n).map(l => (g, l, 1L + rng.nextInt(40).toLong, total))
    }
    val df = rows.toDF("grp", "line", "w", "total")
    val sums = Allocate.largestRemainder(df, Seq("grp"), "w", "total",
        Seq("line"))
      .groupBy("grp")
      .agg(sum("alloc").as("s"), first("total").as("t"))
      .where(col("s") =!= col("t"))
    assert(sums.count() == 0)
  }

  test("transitionMatrix: counts and row-normalized probs") {
    // user 1: A→B→A ; user 2: A→B — transitions: A→B ×2, B→A ×1
    val df = Seq((1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"),
      (1L, 30L, 3L, "A"), (2L, 10L, 4L, "A"), (2L, 20L, 5L, "B"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Stats.transitionMatrix(df, Seq("user_id"), "ts",
        "event_id", "event_type")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(("A", "B") -> ((2L, 1.0)), ("B", "A") -> ((1L, 1.0))))
  }

  test("transitionMatrix: equal timestamps ordered by tie column") {
    val df = Seq((1L, 10L, 2L, "B"), (1L, 10L, 1L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Stats.transitionMatrix(df, Seq("user_id"), "ts",
        "event_id", "event_type")
      .select(col("from_state"), col("to_state"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("A", "B"))) // event_id 1 precedes 2
  }

  test("gapFillLocf: grid spans min..max, carries last observation") {
    // user 1 observes at buckets 0 and 3 (step 10): buckets 1,2 carry
    // the bucket-0 value; bucket 0 takes the LATER of two in-bucket
    // events (t=9 wins over t=1)
    val df = Seq((1L, 1L, 1L, 10.0), (1L, 9L, 2L, 20.0),
      (1L, 35L, 3L, 30.0))
      .toDF("user_id", "t", "event_id", "value")
    val got = Stats.gapFillLocf(df, Seq("user_id"), "t", "value",
        "event_id", stepSec = 10L)
      .select(col("bucket"), col("value_filled"))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 20.0, 1L -> 20.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("gapFillLocf: null winners are carried across (ignoreNulls), " +
    "leading null region stays null") {
    // user 1: bucket 0 winner NULL, bucket 2 -> 5.0, bucket 4 winner
    // NULL, bucket 6 -> 7.0 (step 10). Expected fill: 0,1 null
    // (leading, before first non-null); 2..5 carry 5.0 ACROSS the
    // null-winner bucket 4; 6 -> 7.0
    val df = Seq((1L, 1L, 1L, None: Option[Double]),
      (1L, 25L, 2L, Some(5.0)), (1L, 45L, 3L, None),
      (1L, 65L, 4L, Some(7.0)))
      .toDF("user_id", "t", "event_id", "value")
    val got = Stats.gapFillLocf(df, Seq("user_id"), "t", "value",
        "event_id", stepSec = 10L)
      .select(col("bucket"), col("value_filled"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(0L -> None, 1L -> None, 2L -> Some(5.0),
      3L -> Some(5.0), 4L -> Some(5.0), 5L -> Some(5.0),
      6L -> Some(7.0)))
  }

  test("gapFillLocf: in-bucket tie on t resolved by tie column") {
    val df = Seq((1L, 5L, 1L, 1.0), (1L, 5L, 2L, 2.0))
      .toDF("user_id", "t", "event_id", "value")
    val got = Stats.gapFillLocf(df, Seq("user_id"), "t", "value",
        "event_id", stepSec = 10L)
      .select(col("value_filled")).as[Double].collect().toSeq
    assert(got == Seq(2.0)) // higher event_id wins
  }

  test("groupTrend: exact line recovered; degenerate groups are NULL") {
    // group a: y = 3x + 2 exactly; group b: one point (no slope);
    // group c: zero x-variance (vertical)
    val df = Seq(("a", 0, 2.0), ("a", 1, 5.0), ("a", 2, 8.0),
      ("b", 5, 1.0), ("c", 7, 1.0), ("c", 7, 9.0))
      .toDF("g", "x", "y")
      .select(col("g"), col("x"), col("y").cast("decimal(18,4)").as("y"))
    val got = Stats.groupTrend(df, Seq("g"), "x", "y")
      .select(col("g"), col("slope"), col("intercept"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(got("a") == ((Some(3.0), Some(2.0))))
    assert(got("b") == ((None, None)))
    assert(got("c") == ((None, None)))
  }

  test("groupTrend matches the closed form on noisy data") {
    val pts = Seq((0, 1.5), (1, 2.25), (2, 2.0), (3, 4.75), (4, 4.0))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
      .select(col("g"), col("x"), col("y").cast("decimal(18,4)").as("y"))
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r = Stats.groupTrend(df, Seq("g"), "x", "y")
      .select(col("slope"), col("intercept")).collect().head
    assert(math.abs(r.getDouble(0) - slope) < 1e-6)
    assert(math.abs(r.getDouble(1) - (sy - slope * sx) / n) < 1e-6)
  }

  test("quantileBin: quartile coding with ties in the lower bin") {
    // values 1..8: quartile boundaries at 2.75, 4.5, 6.25 → bins
    // {1,2}:1 {3,4}:2 {5,6}:3 {7,8}:4 ; a tie ON the boundary stays low
    val df = (1 to 8).map(v => (v.toLong, v.toDouble)).toDF("id", "v")
    val got = Stats.quantileBin(df, "v", Seq(0.25, 0.5, 0.75), "bin")
      .select(col("id"), col("bin")).as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2,
      5L -> 3, 6L -> 3, 7L -> 4, 8L -> 4))
  }

  test("quantileBin: bucketed boundaries equal the single-window form") {
    val rng = new scala.util.Random(3)
    val df = (1 to 400).map(i => (i.toLong, rng.nextInt(1000).toDouble))
      .toDF("id", "v")
    val a = Stats.quantileBin(df, "v", Seq(0.2, 0.4, 0.6, 0.8), "bin")
      .select(col("id"), col("bin")).as[(Long, Int)].collect().toMap
    val b = Stats.quantileBin(df, "v", Seq(0.2, 0.4, 0.6, 0.8), "bin",
        orderBuckets = 5)
      .select(col("id"), col("bin")).as[(Long, Int)].collect().toMap
    assert(a == b)
    assert(a.values.toSet == Set(1, 2, 3, 4, 5))
  }

  test("weightedMedian: lower median by cumulative weight") {
    // g: values 1(w5), 2(w1), 3(w10) → W=16, half=8 → first cum*2≥16
    // is value 3 (cum 16); h: symmetric 1(w1),2(w1) → lower median 1
    val df = Seq(("g", 1.0, 5L), ("g", 2.0, 1L), ("g", 3.0, 10L),
      ("h", 1.0, 1L), ("h", 2.0, 1L)).toDF("k", "v", "w")
    val got = Stats.weightedMedian(df, Seq("k"), "v", "w")
      .as[(String, Double)].collect().toMap
    assert(got == Map("g" -> 3.0, "h" -> 1.0))
  }

  test("weightedMedian with unit weights is the lower median") {
    val df = (1 to 9).map(i => ("k", i.toDouble, 1L)).toDF("k", "v", "w")
    val got = Stats.weightedMedian(df, Seq("k"), "v", "w")
      .as[(String, Double)].collect().toMap
    assert(got == Map("k" -> 5.0))
  }

  test("mergeAggStates(base, delta) equals the full recompute") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 300).map(i =>
      (i % 37, rng.nextInt(1000).toLong, rng.nextInt(2) == 0))
    def aggOf(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("k")).agg(count(lit(1)).as("n"),
        sum(col("v")).as("s"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
    val all = rows.map(r => (r._1, r._2)).toDF("k", "v")
    val base = rows.filter(_._3).map(r => (r._1, r._2)).toDF("k", "v")
    val delta = rows.filterNot(_._3).map(r => (r._1, r._2)).toDF("k", "v")
    val merged = Stats.mergeAggStates(aggOf(base), aggOf(delta),
      Seq("k"), "n", "s", "mn", "mx")
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    val want = aggOf(all)
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(merged == want)
  }

  test("mergeAggStates: keys present on only one side survive") {
    val base = Seq((1, 2L, 10L, 3L, 7L)).toDF("k", "n", "s", "mn", "mx")
    val delta = Seq((2, 1L, 5L, 5L, 5L)).toDF("k", "n", "s", "mn", "mx")
    val got = Stats.mergeAggStates(base, delta, Seq("k"), "n", "s",
        "mn", "mx")
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1, 2L, 10L, 3L, 7L), (2, 1L, 5L, 5L, 5L)))
  }

  test("cusumAlerts matches the sequential recursion") {
    // hand-run max(0, S + (x-10)) with threshold 5:
    // x: 12,13,8,14,9 → S: 2,5,3,7,6 → alerts at x=14 (7) and x=9 (6)
    val df = Seq((1L, 1L, 12.0), (1L, 2L, 13.0), (1L, 3L, 8.0),
      (1L, 4L, 14.0), (1L, 5L, 9.0)).toDF("k", "t", "v")
    val got = Stats.cusumAlerts(df, Seq("k"), "t", "t", "v", 10.0, 5.0)
      .select(col("t"), col("cusum").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(4L -> 7.0, 5L -> 6.0))
  }

  test("cusumAlerts: reset clamps at zero (deep dips don't bank credit)") {
    // x: 0,15,16 → S: max(0,-10)=0, 5, 11 — without the reset the dip
    // would carry -10 and suppress the second alert
    val df = Seq((1L, 1L, 0.0), (1L, 2L, 15.0), (1L, 3L, 16.0))
      .toDF("k", "t", "v")
    val got = Stats.cusumAlerts(df, Seq("k"), "t", "t", "v", 10.0, 4.0)
      .select(col("t"), col("cusum").cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(2L -> 5.0, 3L -> 11.0))
  }

  test("skyline2d equals the quadratic dominance definition") {
    val rng = new scala.util.Random(13)
    val pts = (1 to 200).map(i =>
      (i.toLong, rng.nextInt(100).toDouble, rng.nextInt(100)))
    val df = pts.toDF("id", "x", "y")
    val got = Stats.skyline2d(df, "x", "y")
      .select(col("id")).as[Long].collect().toSet
    val want = pts.filter { p =>
      !pts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.map(_._1).toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < pts.size)
  }

  test("skyline2d: equal-(x,y) duplicates all survive") {
    val df = Seq((1L, 1.0, 5), (2L, 1.0, 5), (3L, 2.0, 4))
      .toDF("id", "x", "y")
    val got = Stats.skyline2d(df, "x", "y")
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // 3 dominated by both (higher x, lower y)
  }

  test("percentRank equals the window percent_rank, ties share ranks") {
    val rng = new scala.util.Random(23)
    val df = (1 to 300).map(i => (i.toLong, rng.nextInt(40).toDouble))
      .toDF("id", "v")
    val got = Stats.percentRank(df, "v", buckets = 7)
      .select(col("id"), col("pct_rank"))
      .as[(Long, Double)].collect().toMap
    import org.apache.spark.sql.expressions.Window
    val want = df.withColumn("pr",
        percent_rank().over(Window.orderBy(col("v"))))
      .select(col("id"), col("pr")).as[(Long, Double)].collect().toMap
    assert(got == want)
  }

  test("percentRank: single row is 0, not a division error") {
    val df = Seq((1L, 5.0)).toDF("id", "v")
    val got = Stats.percentRank(df, "v")
      .select(col("pct_rank")).as[Double].collect().toSeq
    assert(got == Seq(0.0))
  }

  test("groupCorr: exact correlation on a perfect line and a flat one") {
    // y = 2x exactly → r = 1; constant y → NULL (zero variance)
    val df = Seq(("a", 1, 2), ("a", 2, 4), ("a", 3, 6),
      ("b", 1, 5), ("b", 2, 5), ("b", 3, 5)).toDF("k", "x", "y")
      .select(col("k"), col("x").cast("decimal(18,4)").as("x"),
        col("y").cast("decimal(18,4)").as("y"))
    val got = Stats.groupCorr(df, Seq("k"), "x", "y")
      .select(col("k"), col("corr")).collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a") == Some(1.0))
    assert(got("b") == None)
  }

  test("groupCorr matches the closed form on noisy data") {
    val pts = Seq((1.0, 2.5), (2.0, 1.5), (3.0, 4.0), (4.0, 3.5),
      (5.0, 6.25))
    val df = pts.map { case (x, y) => ("g", x, y) }.toDF("k", "x", "y")
      .select(col("k"), col("x").cast("decimal(18,4)").as("x"),
        col("y").cast("decimal(18,4)").as("y"))
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got = Stats.groupCorr(df, Seq("k"), "x", "y")
      .select(col("corr")).as[Double].collect().head
    assert(math.abs(got - want) < 1e-6)
  }

  test("topMassPerKey: per-key nucleus cut with boundary semantics") {
    // key g: 50,30,20 at 4/5 → {a,b}; key h: 10,10 at 1/2 → first by
    // entity tie-break only
    val per = Seq(("g", "a", 50L), ("g", "b", 30L), ("g", "c", 20L),
      ("h", "x", 10L), ("h", "y", 10L)).toDF("k", "e", "v")
    val got = Stats.topMassPerKey(per, Seq("k"), "e", "v", 4, 5)
      .select(col("k"), col("e")).as[(String, String)].collect().toSet
    assert(got == Set(("g", "a"), ("g", "b"), ("h", "x"), ("h", "y")))
    val half = Stats.topMassPerKey(per, Seq("k"), "e", "v", 1, 2)
      .select(col("k"), col("e")).as[(String, String)].collect().toSet
    assert(half == Set(("g", "a"), ("h", "x")))
  }

  test("paretoCover: unique minimal prefix; boundary entity included") {
    // values 50,30,20 of total 100 at 4/5: 50+30=80 → needs the 20?
    // (80 − nothing) rule: row qualifies iff cum−v < 80 → 50 (0<80),
    // 30 (50<80), 20 (80<80 false) — exactly the 80% prefix
    val per = Seq(("a", 50), ("b", 30), ("c", 20)).toDF("e", "v")
      .select(col("e"), col("v").cast("decimal(18,4)").as("v"))
    val got = Stats.paretoCover(per, "e", "v", 4, 5)
      .select(col("e")).as[String].collect().toSet
    assert(got == Set("a", "b"))
  }

  test("paretoCover: value ties broken by entity; exact boundary") {
    // four equal values at 1/2: cover must be the first two by entity
    val per = Seq(("d", 10), ("c", 10), ("b", 10), ("a", 10))
      .toDF("e", "v")
      .select(col("e"), col("v").cast("decimal(18,4)").as("v"))
    val got = Stats.paretoCover(per, "e", "v", 1, 2)
      .select(col("e")).as[String].collect().toSet
    assert(got == Set("a", "b"))
  }

  test("paretoCover: bucketed prefix equals the single-window form") {
    val rng = new scala.util.Random(11)
    val per = (1 to 500).map(i => (i.toLong, rng.nextInt(10000)))
      .toDF("e", "v")
      .select(col("e"), col("v").cast("decimal(18,4)").as("v"))
    val got = Stats.paretoCover(per, "e", "v", 4, 5, buckets = 7)
      .select(col("e")).as[Long].collect().toSet
    // reference: plain global cumulative in one partition
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("v").desc, col("e"))
    val tot = per.agg(sum("v")).as[java.math.BigDecimal].head
    val want = per.withColumn("cum", sum("v").over(w))
      .where((col("cum") - col("v")) * lit(5) < lit(tot) * lit(4))
      .select(col("e")).as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < 500)
  }
}
