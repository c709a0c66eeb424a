package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("one-pass profile: nulls, exact distincts, min/max/avg per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (null, 30.0), (2.0, null), (3.0, null)
    ).toDF("a", "b")
    val got = Profile.profileNumeric(df, Seq("a", "b"))
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == ("a", 1L, 3L, 1.0, 3.0, 2.0))
    assert(got("b") == ("b", 2L, 2L, 10.0, 30.0,
      math.rint((10 + 10 + 30) / 3.0 * 1e6) / 1e6))
    // one scan, one aggregate pair (partial+final through the Expand)
    val plan = Profile.profileNumeric(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"),
      "exact multi-distinct must plan through Expand (documented trade)")
    assert("Scan".r.findAllIn(plan).size <= 2, s"profile must scan once")
  }

  test("approx profile: HLL estimate within tolerance of exact") {
    val df = (1 to 2000)
      .map(i => (i % 97, if (i % 10 == 0) None else Some(i % 403)))
      .toDF("a", "b")
    val exact = Profile.profileNumeric(df, Seq("a", "b"))
      .select($"column", $"n_distinct").as[(String, Long)].collect().toMap
    val approx = Profile.profileNumeric(df, Seq("a", "b"), approx = true)
      .select($"column", $"n_distinct").as[(String, Long)].collect().toMap
    // default rsd 0.05; allow 4x — seeded data, a failure means the
    // estimator regressed, not that the sketch got unlucky
    for ((c, nd) <- exact) {
      assert(math.abs(approx(c) - nd) <= math.max(1, (nd * 0.2).toLong),
        s"$c: approx ${approx(c)} vs exact $nd")
    }
  }

  test("mergeableDistinct: strata ≈ exact; __all__ comes from sketch union") {
    val df = (1 to 5000)
      .map(i => (s"s${i % 3}", (i * 7919) % 1200)).toDF("src", "u")
    val got = Profile.mergeableDistinct(df, "src", "u")
      .as[(String, Long)].collect().toMap
    assert(got.keySet == Set("s0", "s1", "s2", "__all__"))
    val exactAll = df.select($"u").distinct().count()
    for (s <- Seq("s0", "s1", "s2")) {
      val exact = df.where($"src" === s).select($"u").distinct().count()
      assert(math.abs(got(s) - exact) <= math.max(2, (exact * 0.05).toLong),
        s"$s: est ${got(s)} vs exact $exact")
    }
    assert(math.abs(got("__all__") - exactAll)
      <= math.max(2, (exactAll * 0.05).toLong),
      s"__all__: est ${got("__all__")} vs exact $exactAll")
    // merged estimate must respect union bounds vs the strata estimates
    assert(got("__all__") >= Seq("s0", "s1", "s2").map(got).max)
    assert(got("__all__") <= Seq("s0", "s1", "s2").map(got).sum)
  }

  // q149's correctness contract: the driver's check is rows-only (no
  // exact oracle for a sketch), so the error bound vs exact is pinned
  // HERE on the real driver data — hll_sketch_agg's default lgConfigK=12
  // has rsd ≈ 1.04/√4096 ≈ 1.6%; 5% is 3σ with slack. The exact-mode
  // parity twin (q156_mergeable_exact) is hash-checked by the driver.
  test("q149 contract: HLL strata estimates within 5% of exact on " +
      "driver events data") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.GraftSession.table(spark, dir, "events")
    val got = Profile.mergeableDistinct(ev, "event_type", "user_id")
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy($"event_type".cast("string").as("s"))
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap +
      ("__all__" -> ev.select($"user_id").distinct().count())
    assert(got.keySet == exact.keySet)
    for ((s, n) <- exact)
      assert(math.abs(got(s) - n) <= math.max(2, (n * 0.05).toLong),
        s"$s: est ${got(s)} vs exact $n exceeds the 5% sketch bound")
  }

  test("string profile: nulls, empties, distincts, char-length stats") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "abc"), (2L, ""), (3L, null), (4L, "abc"), (5L, "hello")
    ).toDF("id", "s")
    val got = Profile.profileString(df, Seq("s"))
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().head
    // NULL excluded from lengths; '' counts as length 0
    assert(got == (("s", 1L, 1L, 3L, 0L, 5L,
      math.rint((3 + 0 + 3 + 5) / 4.0 * 1e6) / 1e6)))
    // approx mode swaps only n_distinct, keeps everything else
    val e = Profile.profileString(df, Seq("s")).drop("n_distinct")
      .collect().toSeq
    val a = Profile.profileString(df, Seq("s"), approx = true)
      .drop("n_distinct").collect().toSeq
    assert(e == a)
  }

  test("constraint checks: violations counted, NULL predicate violates") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, -1.0), (3L, null), (4L, 50.0)
    ).toDF("id", "v")
    val got = Profile.checkConstraints(df, Seq(
        "v_positive" -> (col("v") > 0),
        "id_nonnull" -> col("id").isNotNull))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // -1.0 fails, NULL is unknown → also a violation
    assert(got("v_positive") == (("v_positive", 4L, 2L, false)))
    assert(got("id_nonnull") == (("id_nonnull", 4L, 0L, true)))
  }

  test("approx profile changes ONLY n_distinct; all else is identical") {
    val df = (1 to 2000)
      .map(i => (i % 97, if (i % 10 == 0) None else Some(i % 403)))
      .toDF("a", "b")
    val e = Profile.profileNumeric(df, Seq("a", "b")).drop("n_distinct")
      .orderBy($"column").collect().toSeq
    val a = Profile.profileNumeric(df, Seq("a", "b"), approx = true)
      .drop("n_distinct").orderBy($"column").collect().toSeq
    assert(e == a)
  }
}

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("sweepConcurrency: change points carry the open-interval count") {
    // [1,5] [3,8] [6,6]: conc 1@1, 2@3, 1@6(+1-1... trace below)
    val iv = Seq((1L, 5L), (3L, 8L), (6L, 6L)).toDF("s", "e")
    val got = Stats.sweepConcurrency(iv, "s", "e")
      .orderBy(col("t")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // t=1:+1→1; t=3:+1→2; t=6: -1(end 5)+1(start 6)→2 SUPPRESSED
    // (delta 0); t=7: -1(end 6)→1; t=9: -1(end 8)→0
    assert(got == Seq((1L, 1L), (3L, 2L), (7L, 1L), (9L, 0L)))
  }

  test("theilSenSlope shrugs off the outlier that wrecks OLS") {
    // y = 2x except one wild point; 14 of 15 pairwise slopes stay
    // near 2, so the median slope is robust
    val pts = Seq((0, 0), (1, 2), (2, 4), (3, 6), (4, 1000))
      .map { case (x, y) => ("k", x, y) }.toDF("g", "x", "y")
    val ts = Stats.theilSenSlope(pts, Seq("g"), "x", "y")
      .collect().head
    assert(ts.getAs[Long]("n_pairs") == 10L)
    assert(ts.getAs[Double]("ts_slope") == 2.0)
    val ols = Stats.groupTrend(pts, Seq("g"), "x", "y")
      .collect().head.getAs[Double]("slope")
    assert(ols > 100, s"OLS should be dragged, got $ols")
  }

  test("trimmedMean drops exactly floor(f·n) from each tail") {
    // n=10, f=0.2 → drop 2 each side, keep ranks 3..8
    val df = (1 to 10).map(i => ("k", i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    val got = Stats.trimmedMean(df, Seq("g"), "v", "id", 0.2)
      .collect().head
    assert(got.getAs[Long]("n_kept") == 6L)
    assert(got.getAs[Double]("trimmed_mean") == 5.5)
    // f=0 keeps everything (plain mean)
    val full = Stats.trimmedMean(df, Seq("g"), "v", "id", 0.0)
      .collect().head
    assert(full.getAs[Long]("n_kept") == 10L)
    assert(full.getAs[Double]("trimmed_mean") == 5.5)
  }

  test("exactPercentiles equals built-in percentile bit-for-bit") {
    val rnd = new scala.util.Random(3)
    val df = Seq.fill(5000)((rnd.nextInt(4), rnd.nextDouble() * 1000))
      .toDF("g", "v")
    val builtin = df.groupBy($"g")
      .agg(expr("percentile(v, 0.25)").as("p25"),
           expr("percentile(v, 0.5)").as("p50"),
           expr("percentile(v, 0.9)").as("p90"))
      .as[(Int, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val ours = Stats.exactPercentiles(df, Seq("g"), "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
      .as[(Int, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(builtin.keySet == ours.keySet)
    builtin.foreach { case (g, (a, b, c)) =>
      val (x, y, z) = ours(g)
      assert(a == x && b == y && c == z, s"group $g: ($a,$b,$c) vs ($x,$y,$z)")
    }
  }

  test("winsorize clamps exactly to the per-key percentile band") {
    // key a: values 1..100 → p10 = 10.9, p90 = 90.1 (interpolated);
    // key b untouched within its own band
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("b", 5.0), ("b", 6.0), ("b", 7.0))).toDF("k", "v")
    val got = Stats.winsorize(df, Seq("k"), "v", 0.10, 0.90)
    val a = got.where($"k" === "a")
      .select(min($"wins"), max($"wins")).as[(Double, Double)].head()
    assert(math.abs(a._1 - 10.9) < 1e-9 && math.abs(a._2 - 90.1) < 1e-9)
    val aCounts = got.where($"k" === "a" && ($"v" < $"_lo"))
      .count()
    assert(aCounts == 10) // 1..10 all sit below 10.9
    val b = got.where($"k" === "b").select($"v", $"wins")
      .as[(Double, Double)].collect()
    assert(b.forall { case (v, w) => v == w || math.abs(v - w) < 0.5 })
  }

  test("ohlcBars: deterministic open/close under timestamp ties") {
    val ev = Seq(
      (10L, 1L, 5.0), (10L, 2L, 7.0),    // same second: open ties to id 1
      (3599L, 3L, 1.0),                   // bar 0 low AND close
      (3600L, 4L, 9.0), (7199L, 5L, 2.0)  // bar 1
    ).toDF("sec", "id", "v")
    val got = Stats.ohlcBars(ev, "sec", "id", "v", 3600L)
      .as[(Long, Double, Double, Double, Double, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 5.0, 7.0, 1.0, 1.0, 3L, 4.333333)))
    assert(got(1L) == ((1L, 9.0, 9.0, 2.0, 2.0, 2L, 5.5)))
  }

  test("decayedSum: exact power-of-two staircase decay from the anchor") {
    val df = Seq(
      (1L, 100L, 8.0),  // age 0  → /1
      (1L, 90L, 8.0),   // age 10 → /2
      (1L, 75L, 8.0),   // age 25 → /4
      (2L, 100L, 1.0)
    ).toDF("k", "t", "v")
    val byKey = Stats.decayedSum(df, Seq("k"), "t", "v", halfLifeSec = 10L)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(byKey(1L) == ((8.0 + 4.0 + 2.0, 3L)))
    assert(byKey(2L) == ((1.0, 1L)))
  }

  test("movingTimeAvg: RANGE frame spans elapsed time and includes ties") {
    val df = Seq(
      (1L, 0L, 2.0, 10), (1L, 1800L, 4.0, 11),
      (1L, 3600L, 6.0, 12), (1L, 3601L, 8.0, 13),
      (2L, 10L, 1.0, 20), (2L, 10L, 3.0, 21) // equal-time peers
    ).toDF("k", "t", "v", "id")
    val got = Stats.movingTimeAvg(df, Seq("k"), "t", "v", 3600L)
      .collect().map(r => r.getInt(r.fieldIndex("id")) ->
        ((r.getDouble(r.fieldIndex("moving_avg")),
          r.getLong(r.fieldIndex("n_in_window"))))).toMap
    assert(got(10) == ((2.0, 1L)))
    assert(got(11) == ((3.0, 2L)))
    assert(got(12) == ((4.0, 3L)))          // [0, 3600] all three
    assert(got(13) == ((6.0, 3L)))          // [1, 3601] drops t=0
    assert(got(20) == ((2.0, 2L)) && got(21) == ((2.0, 2L)),
      "equal-time peers must both see the full peer set")
  }

  test("robustOutliers flags per-group median/MAD breaches only") {
    // group A: values 1..9 (med 5, MAD 2 → |v-5| > 6 means v<-1 or v>11)
    // plus spike 100; group B: tight cluster, spike survives factor 10
    val df = ((1 to 9).map(v => ("A", 100L + v, v.toDouble)) :+
        ("A", 200L, 100.0) :+ ("B", 300L, 5.0) :+ ("B", 301L, 5.0) :+
        ("B", 302L, 5.2))
      .toDF("g", "id", "v")
    val out3 = Stats.robustOutliers(df, Seq("g"), "v", 3.0)
      .select($"id").as[Long].collect().toSet
    // A's spike, plus B's 5.2: a MAD-0 group treats ANY deviation as an
    // outlier (0.2 > 3·0) — the documented degenerate-group semantic
    assert(out3 == Set(200L, 302L))
    // huge factor: A's spike drops (95 < 1000·2) but MAD-0 B stays
    val ids = Stats.robustOutliers(df, Seq("g"), "v", 1000.0)
      .select($"id").as[Long].collect().toSet
    assert(ids == Set(302L))
  }

  test("two-level (orderBuckets) mode is bit-identical to single-level") {
    val rnd = new scala.util.Random(17)
    // duplicates, a NULL-key group, and NULL values all in one table
    val df = (Seq.fill(4000)((Some(rnd.nextInt(3)),
        Some((rnd.nextInt(500) / 7.0)))) ++
      Seq.fill(50)((Option.empty[Int], Some(rnd.nextDouble() * 10))) ++
      Seq((Some(0), Option.empty[Double]), (Some(9), Option.empty[Double])))
      .toDF("g", "v")
    val probs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    val single = Stats.exactPercentiles(df, Seq("g"), "v", probs)
      .as[(Option[Int], Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    for (buckets <- Seq(2, 8, 64)) {
      val multi = Stats.exactPercentiles(df, Seq("g"), "v", probs, buckets)
        .as[(Option[Int], Option[Double], Option[Double], Option[Double])]
        .collect().toSet
      assert(multi == single, s"orderBuckets=$buckets diverged")
    }
  }

  test("two-level rank window partitions by (key, bucket), not key alone") {
    val df = Seq.fill(500)((1, scala.util.Random.nextDouble())).toDF("g", "v")
    val p = Stats.exactPercentiles(df, Seq("g"), "v",
        Seq("p50" -> 0.5), orderBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_ob"),
      s"the heavy cumulative window must include the order bucket:\n$p")
  }

  test("all-NULL group yields a row with NULL percentile, like the built-in") {
    val df = Seq((0, Some(1.0)), (0, Some(3.0)), (1, Option.empty[Double]))
      .toDF("g", "v")
    val got = Stats.exactPercentiles(df, Seq("g"), "v", Seq("p50" -> 0.5))
      .as[(Int, Option[Double])].collect().toMap
    assert(got == Map(0 -> Some(2.0), 1 -> None))
  }

  test("single-element and duplicate-heavy groups") {
    val df = (Seq((0, 42.0)) ++ Seq.fill(100)((1, 7.0)) ++
      Seq((1, 9.0))).toDF("g", "v")
    val got = Stats.exactPercentiles(df, Seq("g"), "v",
        Seq("p50" -> 0.5))
      .as[(Int, Double)].collect().toMap
    assert(got(0) == 42.0)
    assert(got(1) == 7.0) // median of 100×7.0 + one 9.0
  }

  test("linearInterp: interior lerp, nearest-known edges, passthrough") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", 0L, Some(10.0)), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some(20.0)), ("a", 9L, Some(5.0)),
      ("b", 1L, None), ("b", 2L, Some(7.0)), ("b", 5L, None),
      ("c", 1L, None), ("c", 2L, None) // all-null key stays null
    ).toDF("k", "t", "v")
    val got = Stats.linearInterp(df, Seq("k"), "t", "v")
      .select(col("k"), col("t"), col("interp"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got(("a", 0L)) == Some(10.0)) // known values pass through
    assert(got(("a", 2L)) == Some(15.0)) // 10 + (20-10)·(2/4)
    assert(got(("a", 3L)) == Some(17.5))
    assert(got(("a", 9L)) == Some(5.0))
    assert(got(("b", 1L)) == Some(7.0))  // leading edge → next known
    assert(got(("b", 5L)) == Some(7.0))  // trailing edge → last known
    assert(got(("c", 1L)).isEmpty && got(("c", 2L)).isEmpty)
  }
}

class InterleaveSpec extends SparkTestBase {
  import spark.implicits._

  test("pairInterleave alternates A/B records in index order") {
    val a = Seq((0L, "a0"), (1L, "a1"), (2L, "a2")).toDF("idx", "rec")
    val b = Seq((0L, "b0"), (1L, "b1"), (2L, "b2")).toDF("idx", "rec")
    val got = graft.sources.Interleave.pairInterleave(a, b, "idx")
      .select($"rec").as[String].collect().toSeq
    assert(got == Seq("a0", "b0", "a1", "b1", "a2", "b2"))
  }
}
