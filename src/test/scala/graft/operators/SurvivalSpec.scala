package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SurvivalSpec extends SparkTestBase {
  import spark.implicits._

  test("kaplanMeier matches the textbook product-limit on a hand example") {
    // classic small example: events at t=1 (2 deaths of 10), t=3
    // (1 death of 7 at risk — one censored at 2, so 10-2-1=7), t=5
    // (1 of 4: censored at 3 and 4 drop 2 more... laid out below)
    // subjects: durations/events chosen so at-risk counts are easy to
    // trace by hand.
    val subj = Seq(
      (1, true), (1, true), (2, false), (3, true), (3, false),
      (4, false), (5, true), (6, false), (7, false), (8, false)
    ).toDF("dur", "ev").withColumn("g", lit("a"))
    val km = Survival.kaplanMeier(subj, Seq("g"), "dur", "ev")
      .orderBy(col("dur"))
      .select(col("dur"), col("n_risk"), col("n_events"), col("survival"))
      .collect()
    // t=1: n=10 d=2 -> S=0.8
    // t=3: n=7 (10-2-1censored@2) d=1 -> S=0.8*(6/7)
    // t=5: n=4 (7-2@3-1@4) d=1 -> S=0.8*(6/7)*(3/4)
    assert(km.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1, 10L, 2L), (3, 7L, 1L), (5, 4L, 1L)))
    val s = km.map(_.getDouble(3))
    assert(math.abs(s(0) - 0.8) < 1e-9)
    assert(math.abs(s(1) - 0.8 * 6 / 7) < 1e-6)
    assert(math.abs(s(2) - 0.8 * (6.0 / 7) * 0.75) < 1e-6)
  }

  test("kaplanMeier: everyone dying at the last time pins S to exactly 0") {
    val subj = Seq((1, true), (2, true), (2, true))
      .toDF("dur", "ev").withColumn("g", lit("a"))
    val km = Survival.kaplanMeier(subj, Seq("g"), "dur", "ev")
      .orderBy(col("dur")).collect()
    assert(km.last.getAs[Double]("survival") == 0.0)
    assert(km.head.getAs[Double]("survival") > 0.6)
  }

  test("kaplanMeier: censored subjects at an event time count as at-risk") {
    // tie convention: censoring at t happens after t's deaths
    val subj = Seq((2, true), (2, false), (2, false))
      .toDF("dur", "ev").withColumn("g", lit("a"))
    val km = Survival.kaplanMeier(subj, Seq("g"), "dur", "ev").collect()
    assert(km.length == 1)
    assert(km.head.getAs[Long]("n_risk") == 3L)
    assert(math.abs(km.head.getAs[Double]("survival") - 2.0 / 3) < 1e-6)
  }

  test("timeWeightedAvg weights by interval length, not row count") {
    // value 10 holds for 9 time units, value 100 for 1 -> TWA = 19,
    // while the naive row average is 55
    val iv = Seq(("u", 0L, 9L, 10.0), ("u", 9L, 10L, 100.0))
      .toDF("k", "s", "e", "v")
    val got = Survival.timeWeightedAvg(iv, Seq("k"), "s", "e", "v")
      .collect().head
    assert(got.getAs[Long]("total_time") == 10L)
    assert(got.getAs[Double]("tw_avg") == 19.0)
  }

  test("timeWeightedAvg: zero-length-only key yields NULL, not NaN") {
    val iv = Seq(("z", 5L, 5L, 10.0)).toDF("k", "s", "e", "v")
    val got = Survival.timeWeightedAvg(iv, Seq("k"), "s", "e", "v")
      .collect().head
    assert(got.isNullAt(got.fieldIndex("tw_avg")))
  }

  test("contingencyStats: perfectly independent table has MI 0, chi2 0") {
    // uniform 3x4 grid, every cell count 5: O = E everywhere
    val rows = for {
      x <- 1 to 3; y <- 1 to 4; _ <- 1 to 5
    } yield (s"x$x", s"y$y")
    val got = Stats.contingencyStats(rows.toDF("x", "y"), "x", "y")
      .collect().head
    assert(got.getAs[Long]("n") == 60L)
    assert(got.getAs[Long]("dof") == 6L)
    assert(got.getAs[Double]("mi") == 0.0)
    assert(got.getAs[Double]("chi2") == 0.0)
    assert(got.getAs[Double]("cramers_v") == 0.0)
  }

  test("contingencyStats: perfectly dependent 2x2 maxes Cramér's V at 1") {
    val rows = Seq.fill(10)(("a", "p")) ++ Seq.fill(15)(("b", "q"))
    val got = Stats.contingencyStats(rows.toDF("x", "y"), "x", "y")
      .collect().head
    assert(got.getAs[Double]("cramers_v") == 1.0)
    assert(got.getAs[Long]("dof") == 1L)
    // MI of a deterministic relation = H(X) = -(0.4 ln 0.4 + 0.6 ln 0.6)
    val h = -(0.4 * math.log(0.4) + 0.6 * math.log(0.6))
    assert(math.abs(got.getAs[Double]("mi") - h) < 1e-5)
  }

  test("contingencyStats: NULL categories are complete-case excluded") {
    // NULL-keyed rows must not leak into N while being absent from the
    // margins (that shifted chi2 by +N_null and corrupted MI/V); with
    // the complete-case filter, a table with NULLs must equal the same
    // table with the NULL rows dropped
    val clean = Seq.fill(10)(("a", "p")) ++ Seq.fill(15)(("b", "q"))
    val dirty = clean ++ Seq(
      (null, "p"), ("a", null), (null, null), (null, "q"))
    val want = Stats.contingencyStats(clean.toDF("x", "y"), "x", "y")
      .collect().head
    val got = Stats.contingencyStats(dirty.toDF("x", "y"), "x", "y")
      .collect().head
    assert(got.getAs[Long]("n") == 25L)
    assert(got == want)
  }

  test("scriptMix counts codepoints per script and picks the dominant") {
    val docs = Seq(
      (1L, "hello world 42"),
      (2L, "привет hello"),
      (3L, "你好世界"),
      (4L, "12345"),
      (5L, null: String)).toDF("doc_id", "text")
    val got = TextAnalysis.scriptMix(docs, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(got(0).getAs[Long]("n_latin") == 10L)
    assert(got(0).getAs[Long]("n_digit") == 2L)
    assert(got(0).getAs[String]("main_script") == "latin")
    assert(got(1).getAs[Long]("n_cyrillic") == 6L)
    assert(got(1).getAs[String]("main_script") == "cyrillic")
    assert(got(2).getAs[Long]("n_han") == 4L)
    assert(got(2).getAs[String]("main_script") == "han")
    assert(got(3).getAs[String]("main_script") == "none")
    assert(got(4).getAs[String]("main_script") == "none")
  }
}
