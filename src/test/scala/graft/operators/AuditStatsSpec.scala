package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed and brute-force oracles for the audit/evaluation
  * statistics: exact AUC (midrank ties), Gini concentration, the Benford
  * digit screen, and item-item co-occurrence cosine.
  */
class AuditStatsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- aucByKey ----

  test("aucByKey hand case with a tie: midrank = trapezoid rule") {
    // pos scores {0.2, 0.3}, neg scores {0.1, 0.2}; P·N = 4 pairs:
    // (0.2 vs 0.1) win, (0.2 vs 0.2) half, (0.3 vs both) 2 wins
    // AUC = 3.5 / 4 = 0.875
    val df = Seq((0.1, false), (0.2, true), (0.2, false), (0.3, true))
      .toDF("score", "pos")
    val got = Stats.aucByKey(df, Nil, "score", col("pos"))
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((2L, 2L, 0.875)))
  }

  test("aucByKey: perfect separation is 1, anti-separation is 0") {
    val perfect = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("score", "pos")
    assert(Stats.aucByKey(perfect, Nil, "score", col("pos"))
      .select("auc").as[Double].head() == 1.0)
    val anti = Seq((1.0, true), (2.0, true), (3.0, false), (4.0, false))
      .toDF("score", "pos")
    assert(Stats.aucByKey(anti, Nil, "score", col("pos"))
      .select("auc").as[Double].head() == 0.0)
  }

  test("aucByKey matches the brute-force pair count per key, and " +
       "orderBuckets is value-identical") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val k = i % 3
      // quantized scores force plenty of ties
      val s = math.floor(rnd.nextDouble() * 20) / 20.0
      val p = rnd.nextDouble() < (0.2 + 0.6 * s)
      (k, s, p)
    }
    val df = spark.sparkContext.parallelize(rows, 5).toDF("k", "s", "p")
    def brute(k: Int): Double = {
      val pos = rows.filter(r => r._1 == k && r._3).map(_._2)
      val neg = rows.filter(r => r._1 == k && !r._3).map(_._2)
      val wins = (for (a <- pos; b <- neg) yield
        if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
      BigDecimal(wins / (pos.size.toLong * neg.size))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val flat = Stats.aucByKey(df, Seq("k"), "s", col("p"))
      .select("k", "auc").as[(Int, Double)].collect().toMap
    assert(flat.keySet == Set(0, 1, 2))
    flat.foreach { case (k, auc) => assert(auc == brute(k), s"key $k") }
    val bucketed = Stats.aucByKey(df, Seq("k"), "s", col("p"),
        orderBuckets = 4)
      .select("k", "auc").as[(Int, Double)].collect().toMap
    assert(bucketed == flat)
  }

  test("aucByKey: a single-class key yields NULL auc, not a number") {
    val df = Seq((1, 0.5, true), (1, 0.7, true), (2, 0.5, false),
      (2, 0.7, true)).toDF("k", "s", "p")
    val got = Stats.aucByKey(df, Seq("k"), "s", col("p"))
      .select("k", "auc").collect().map(r =>
        r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1).isEmpty, "P-only key must be undefined")
    assert(got(2).contains(1.0))
  }

  // ---- giniByKey ----

  private def giniBrute(xs: Seq[BigDecimal]): Double = {
    val s = xs.sorted
    val n = s.size
    val s0 = s.sum
    val s1 = s.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
    ((2 * s1 - (n + 1) * s0) / (n * s0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("giniByKey: equal values are 0, one-holder is (n-1)/n") {
    val df = Seq((0, "5.0000"), (0, "5.0000"), (0, "5.0000"),
        (1, "0.0000"), (1, "0.0000"), (1, "0.0000"), (1, "10.0000"))
      .toDF("k", "v").select(col("k"),
        col("v").cast("decimal(18,4)").as("v"))
    val got = Stats.giniByKey(df, Seq("k"), "v")
      .select("k", "n", "gini").as[(Int, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(0) == ((3L, 0.0)))
    assert(got(1) == ((4L, 0.75)))
  }

  test("giniByKey matches the sorted-rank formula with ties, and " +
       "orderBuckets is value-identical") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      (i % 2, BigDecimal(rnd.nextInt(500)).setScale(4) / 100)
    }
    val df = spark.sparkContext.parallelize(rows, 4).toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(18,4)").as("v"))
    val flat = Stats.giniByKey(df, Seq("k"), "v")
      .select("k", "gini").as[(Int, Double)].collect().toMap
    Seq(0, 1).foreach { k =>
      assert(flat(k) == giniBrute(rows.filter(_._1 == k).map(_._2)),
        s"key $k")
    }
    val bucketed = Stats.giniByKey(df, Seq("k"), "v", orderBuckets = 3)
      .select("k", "gini").as[(Int, Double)].collect().toMap
    assert(bucketed == flat)
  }

  // ---- benfordScreen ----

  test("benfordScreen extracts leading nonzero digits and keeps the " +
       "zero-observation spine") {
    // digits: 10.0->1, 1.5->1, 25.0->2, -3.2->3 (sign skipped),
    // 0.07->7 (leading zeros skipped), 0.0 and NULL drop
    val df = Seq(Some(10.0), Some(1.5), Some(25.0), Some(-3.2),
        Some(0.07), Some(0.0), None)
      .toDF("v").select(lit("g").as("k"), col("v"))
    val got = Stats.benfordScreen(df, Seq("k"), "v")
      .select("digit", "obs", "n").as[(Int, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == (1 to 9).toSet, "all 9 digits on the spine")
    assert(got(1) == ((2L, 5L)))
    assert(got(2) == ((1L, 5L)))
    assert(got(3) == ((1L, 5L)))
    assert(got(7) == ((1L, 5L)))
    assert(got(4) == ((0L, 5L)), "zero-obs digit still present")
  }

  test("benfordScreen chi2 equals the rounded-contribution sum") {
    val rnd = new scala.util.Random(3)
    val vals = (1 to 200).map(_ => math.exp(rnd.nextDouble() * 9) + 0.01)
    val df = vals.toDF("v").select(lit("g").as("k"), col("v"))
    val rows = Stats.benfordScreen(df, Seq("k"), "v")
      .select("digit", "obs", "n", "chi2")
      .as[(Int, Long, Long, Double)].collect()
    val n = rows.head._3
    val expect = rows.map { case (d, obs, _, _) =>
      val e = n.toDouble * math.log10(1.0 + 1.0 / d)
      BigDecimal((obs - e) * (obs - e) / e)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    rows.foreach { case (_, _, _, chi2) =>
      assert(math.abs(chi2 - expect) < 1e-9,
        s"chi2 $chi2 vs recomputed $expect")
    }
  }

  // ---- ndcgAtK ----

  test("ndcgAtK: perfect ranking is 1, hand case matches, no-relevant " +
       "key is NULL") {
    // key 1: rels by score-desc order = (1, 0, 1) at k=2:
    //   DCG = 1/log2(2) + 0/log2(3) = 1; ideal rels (1,1,0): IDCG =
    //   1 + 1/log2(3) = 1.630929754; NDCG = 0.613147
    // key 2: purchases exactly at the top -> 1.0;  key 3: no relevant
    val df = Seq(
      (1, 9.0, 101L, 1), (1, 8.0, 102L, 0), (1, 7.0, 103L, 1),
      (2, 9.0, 201L, 1), (2, 8.0, 202L, 0),
      (3, 9.0, 301L, 0), (3, 8.0, 302L, 0))
      .toDF("k", "score", "id", "rel")
    val got = Stats.ndcgAtK(df, Seq("k"), "score", "rel", k = 2,
        tieCol = "id")
      .select("k", "ndcg").collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val idcg = BigDecimal(1.0) +
      BigDecimal(1.0 / math.log(3.0) * math.log(2.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val want = (BigDecimal(1.0) / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1).contains(want), s"got ${got(1)} want $want")
    assert(got(2).contains(1.0))
    assert(got(3).isEmpty, "no relevant rows -> undefined, not 0")
  }

  test("ndcgAtK tiebreak: equal scores order by tieCol on both the " +
       "real and ideal rankings") {
    // equal scores: tie id decides -> rel sequence (0, 1), DCG@1 = 0;
    // ideal = 1 -> ndcg 0
    val df = Seq((1, 5.0, 1L, 0), (1, 5.0, 2L, 1))
      .toDF("k", "score", "id", "rel")
    val got = Stats.ndcgAtK(df, Seq("k"), "score", "rel", 1, "id")
      .select("ndcg").as[Double].head()
    assert(got == 0.0)
  }

  // ---- prAtThresholds ----

  test("prAtThresholds: hand-computed confusion cells at the median") {
    // scores 1..10, positives = {6..10} (ideal score): at the median
    // threshold (5.5), predicted = {6..10}: tp=5 fp=0 fn=0
    val df = (1 to 10).map(i => (i.toDouble, i > 5)).toDF("s", "y")
    val got = Stats.prAtThresholds(df, "s", col("y"), Seq(0.5))
      .select("tp", "fp", "fn", "precision", "recall", "f1")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(got == ((5L, 0L, 0L, 1.0, 1.0, 1.0)))
  }

  test("prAtThresholds: zero-denominator cells are NULL, not 0") {
    // every row positive -> fp impossible; at the p=1.0 threshold (the
    // max) nothing is predicted -> precision NULL, recall 0
    val df = (1 to 4).map(i => (i.toDouble, true)).toDF("s", "y")
    val rows = Stats.prAtThresholds(df, "s", col("y"), Seq(1.0))
      .select("tp", "precision", "recall").collect()
    val r = rows.head
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1), "0/0 precision must be NULL")
    assert(r.getDouble(2) == 0.0)
  }

  // ---- spearmanByKey ----

  private def spearmanBrute(xs: Seq[Double], ys: Seq[Double]): Double = {
    def midranks(v: Seq[Double]): Seq[Double] = {
      val sorted = v.sorted
      v.map { x =>
        val below = sorted.count(_ < x)
        val c = sorted.count(_ == x)
        below + (c + 1) / 2.0
      }
    }
    val rx = midranks(xs); val ry = midranks(ys)
    val n = xs.size.toDouble
    val sx = rx.sum; val sy = ry.sum
    val sxx = rx.map(a => a * a).sum; val syy = ry.map(a => a * a).sum
    val sxy = rx.zip(ry).map { case (a, b) => a * b }.sum
    val r = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("spearmanByKey: monotone is 1, antitone is -1, constant is NULL") {
    val df = Seq(
      (1, 1.0, 10.0), (1, 2.0, 40.0), (1, 3.0, 90.0),
      (2, 1.0, 9.0), (2, 2.0, 4.0), (2, 3.0, 1.0),
      (3, 1.0, 5.0), (3, 2.0, 5.0), (3, 3.0, 5.0))
      .toDF("k", "x", "y")
    val got = Stats.spearmanByKey(df, Seq("k"), "x", "y")
      .select("k", "spearman").collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1).contains(1.0), "any monotone map has rho 1")
    assert(got(2).contains(-1.0))
    assert(got(3).isEmpty, "zero variance -> undefined")
  }

  test("spearmanByKey matches brute-force midrank Pearson under heavy " +
       "ties, and orderBuckets is value-identical") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { _ =>
      val k = rnd.nextInt(2)
      val x = rnd.nextInt(12).toDouble // heavy ties
      val y = (x + rnd.nextInt(8)).toDouble
      (k, x, y)
    }
    val df = spark.sparkContext.parallelize(rows, 5).toDF("k", "x", "y")
    val flat = Stats.spearmanByKey(df, Seq("k"), "x", "y")
      .select("k", "spearman").as[(Int, Double)].collect().toMap
    Seq(0, 1).foreach { k =>
      val sub = rows.filter(_._1 == k)
      assert(flat(k) == spearmanBrute(sub.map(_._2), sub.map(_._3)),
        s"key $k")
    }
    val bucketed = Stats.spearmanByKey(df, Seq("k"), "x", "y",
        orderBuckets = 3)
      .select("k", "spearman").as[(Int, Double)].collect().toMap
    assert(bucketed == flat)
  }

  // ---- quantileNormalize ----

  private def qnormBrute(rows: Seq[(String, Double)])
      : Map[(String, Double), Double] = {
    val global = rows.map(_._2).sorted
    val n = global.size
    rows.groupBy(_._1).flatMap { case (g, grp) =>
      val vals = grp.map(_._2)
      val m = vals.size
      vals.distinct.map { v =>
        val below = vals.count(_ < v)
        val c = vals.count(_ == v)
        val p = if (m > 1) (below + (c + 1) / 2.0 - 1) / (m - 1) else 0.5
        val pos = p * (n - 1)
        val klo = math.floor(pos).toInt
        val frac = pos - klo
        val vlo = global(klo)
        val vhi = global(math.min(klo + 1, n - 1))
        (g, v) -> BigDecimal((1 - frac) * vlo + frac * vhi)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
  }

  test("quantileNormalize: identical groups map identity; singleton " +
       "group lands on the global median") {
    // two identical groups -> the global distribution IS each group's,
    // so normalization is the identity
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0))
    val got1 = Stats.quantileNormalize(
      spark.sparkContext.parallelize(same, 3).toDF("g", "v"),
      Seq("g"), "v", binSize = 2)
      .select("g", "v", "qnorm").as[(String, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    same.foreach { case (g, v) =>
      assert(got1((g, v)) == v, s"identity at ($g, $v)")
    }
    // a singleton group sits at p = 0.5: global multiset
    // (1,1,2,2,3,3,42), pos = 0.5·6 = 3 -> value 2; the donor groups'
    // extremes map onto the GLOBAL extremes (a's max -> 42)
    val withC = same :+ ("c", 42.0)
    val got2 = Stats.quantileNormalize(
      spark.sparkContext.parallelize(withC, 3).toDF("g", "v"),
      Seq("g"), "v", binSize = 2)
      .select("g", "v", "qnorm").as[(String, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got2(("c", 42.0)) == 2.0)
    assert(got2(("a", 3.0)) == 42.0, "group max lands on global max")
    assert(got2(("a", 1.0)) == 1.0, "group min lands on global min")
  }

  test("quantileNormalize matches the brute-force reference on random " +
       "data with ties, for any binSize") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 250).map { _ =>
      val g = s"s${rnd.nextInt(4)}"
      // per-group shift so the groups genuinely disagree
      (g, (rnd.nextInt(30) + g.last.asDigit * 7).toDouble)
    }
    val want = qnormBrute(rows)
    val df = spark.sparkContext.parallelize(rows, 5).toDF("g", "v")
    Seq(1L, 16L, 4096L).foreach { bs =>
      val got = Stats.quantileNormalize(df, Seq("g"), "v", binSize = bs)
        .select("g", "v", "qnorm").as[(String, Double, Double)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(got == want, s"binSize $bs")
    }
  }

  // ---- gramMatrix ----

  test("gramMatrix: hand case, upper triangle only, partitioning-" +
       "independent") {
    // vectors (1,2) and (3,4): G = [[1+9, 2+12], [., 4+16]]
    val vecs = Seq((0, Seq(1f, 2f)), (0, Seq(3f, 4f)))
    def run(parts: Int) = Similarity.gramMatrix(
      spark.sparkContext.parallelize(vecs, parts).toDF("k", "v"),
      Seq("k"), "v", dim = 2)
      .select("i", "j", "gram").as[(Int, Int, Double)].collect().toSet
    val want = Set((0, 0, 10.0), (0, 1, 14.0), (1, 1, 20.0))
    assert(run(1) == want)
    assert(run(2) == want, "map-side partials must merge exactly")
  }

  test("gramMatrix groups by key and quantizes at 1e-6") {
    val vecs = Seq((0, Seq(0.5f)), (0, Seq(0.5f)), (1, Seq(2f)))
    val df = spark.sparkContext.parallelize(vecs, 3).toDF("k", "v")
    val got = Similarity.gramMatrix(df, Seq("k"), "v", dim = 1)
      .select("k", "gram").as[(Int, Double)].collect().toMap
    assert(got == Map(0 -> 0.5, 1 -> 4.0))
  }

  // ---- itemCosine ----

  test("itemCosine: counts, cosine, minCo cut and deterministic top-k") {
    // baskets: {A,B,C}, {A,B}, {A,C}, {B,C}, {A,D}
    // n: A=4, B=3, C=3, D=1; co: AB=2, AC=2, BC=2, AD=1
    val df = Seq((1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"),
        (3, "A"), (3, "C"), (4, "B"), (4, "C"), (5, "A"), (5, "D"))
      .toDF("b", "item")
    val got = Association.itemCosine(df, Seq("b"), "item",
        minCo = 2, topK = 2)
      .select("item", "neighbor", "n_ab", "cosine", "rank")
      .as[(String, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._5) -> (r._2, r._3, r._4)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ab = r6(2.0 / math.sqrt(4.0 * 3.0))
    val bc = r6(2.0 / math.sqrt(3.0 * 3.0))
    // A: AB and AC tie at cosine ab -> neighbor-asc tiebreak B then C
    assert(got(("A", 1)) == (("B", 2L, ab)))
    assert(got(("A", 2)) == (("C", 2L, ab)))
    // B: BC (2/3) beats BA (ab); D never appears (co=1 < minCo)
    assert(got(("B", 1)) == (("C", 2L, bc)))
    assert(got(("B", 2)) == (("A", 2L, ab)))
    assert(!got.values.exists(_._1 == "D"))
    assert(!got.keys.exists(_._1 == "D"))
  }
}
