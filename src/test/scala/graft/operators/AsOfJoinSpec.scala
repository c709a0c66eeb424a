package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val trades = Seq( // (sym, t, qty)
    ("A", 10L, 1), ("A", 20L, 2), ("A", 5L, 3), ("B", 10L, 4))
    .toDF("sym", "t", "qty")
  private val quotes = Seq( // (sym, qt, px)
    ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 15L, 3.0), ("B", 99L, 9.0))
    .toDF("sym", "qt", "px")

  test("backward as-of picks latest quote at-or-before trade time") {
    val got = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", "qt",
        Seq("px"))
      .select($"sym", $"t", $"qty", $"asof_ts", $"px")
      .as[(String, Long, Int, Option[Long], Option[Double])]
      .collect().map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    assert(got(("A", 10L)) == (Some(10L), Some(2.0))) // tie: inclusive
    assert(got(("A", 20L)) == (Some(15L), Some(3.0)))
    assert(got(("A", 5L)) == (None, None))            // nothing before
    assert(got(("B", 10L)) == (None, None))           // quote after only
  }

  test("tolerance expires stale matches") {
    val got = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", "qt",
        Seq("px"), tolerance = Some(3L))
      .select($"sym", $"t", $"px").as[(String, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("A", 10L)) == Some(2.0)) // gap 0 ≤ 3
    assert(got(("A", 20L)) == None)      // gap 5 > 3
  }

  test("single shuffle: plan has exactly one exchange on the key") {
    val df = AsOfJoin.asofBackward(trades, quotes, Seq("sym"), "t", "qt",
      Seq("px"))
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle:\n$p")
    // and the two LOCF columns share one Window node (one sort)
    assert("Window \\[".r.findAllIn(p).size == 1)
  }

  test("null right payload stays paired with its own timestamp (atomic LOCF)") {
    val q = Seq(("A", 5L, Some(3.0)), ("A", 10L, Option.empty[Double]))
      .toDF("sym", "qt", "px")
    val l = Seq(("A", 12L, 1)).toDF("sym", "t", "qty")
    val row = AsOfJoin.asofBackward(l, q, Seq("sym"), "t", "qt", Seq("px"))
      .select($"asof_ts", $"px").as[(Option[Long], Option[Double])]
      .collect().head
    // the ct=10 row IS the match; its null payload must not be replaced
    // by the older non-null value from ct=5
    assert(row == (Some(10L), None))
  }

  test("latestPerTs makes right side deterministic on duplicate ts") {
    val dup = Seq(("A", 10L, 1.0), ("A", 10L, 7.0)).toDF("sym", "qt", "px")
    val r = AsOfJoin.latestPerTs(dup, Seq("sym"), "qt", "px")
      .as[(String, Long, Double)].collect().toSeq
    assert(r == Seq(("A", 10L, 7.0)))
  }

  test("asofNearest: closer side wins; equidistant breaks backward") {
    // rights at t=10 and t=20. left 13 → backward (Δ-3 beats Δ+7);
    // left 18 → forward (Δ+2); left 15 → equidistant, backward wins
    val l = Seq(("A", 13L, 1), ("A", 18L, 2), ("A", 15L, 3))
      .toDF("sym", "t", "lid")
    val r = Seq(("A", 10L, 100L), ("A", 20L, 200L))
      .toDF("sym", "rt", "rid")
    val got = AsOfJoin.asofNearest(l, r, Seq("sym"), "t", "rt",
        Seq("rid"), tolerance = 100L)
      .select($"lid", $"rid", $"delta")
      .as[(Int, Long, Long)].collect().toSet
    assert(got == Set((1, 100L, -3L), (2, 200L, 2L), (3, 100L, -5L)))
  }

  test("asofNearest: tolerance nulls both directions; forward-only left edge") {
    // left at t=1 precedes every right → forward match (backward-only
    // would drop it); left at t=500 is out of tolerance both ways
    val l = Seq(("A", 1L, 1), ("A", 500L, 2)).toDF("sym", "t", "lid")
    val r = Seq(("A", 10L, 100L)).toDF("sym", "rt", "rid")
    val got = AsOfJoin.asofNearest(l, r, Seq("sym"), "t", "rt",
        Seq("rid"), tolerance = 50L)
      .select($"lid", $"rid", $"delta")
      .as[(Int, Option[Long], Option[Long])].collect().toSet
    assert(got == Set((1, Some(100L), Some(9L)), (2, None, None)))
  }

  test("asofNearest: right row at the exact left ts is the backward match") {
    val l = Seq(("A", 10L, 1)).toDF("sym", "t", "lid")
    val r = Seq(("A", 10L, 100L), ("A", 11L, 200L)).toDF("sym", "rt", "rid")
    val got = AsOfJoin.asofNearest(l, r, Seq("sym"), "t", "rt",
        Seq("rid"), tolerance = 5L)
      .select($"rid", $"delta").as[(Long, Long)].collect().head
    assert(got == ((100L, 0L)))
  }
}
