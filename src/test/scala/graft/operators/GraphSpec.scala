package graft.operators

import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Double)].collect().toMap

  test("pageRank matches the hand-computed recurrence") {
    // 1→2, 2→3, 3→1, 1→3: outdeg(1)=2, N=3, uniform start 1/3
    val pr = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)), 1)
    assert(math.abs(pr(1L) - (0.05 + 0.85 / 3.0)) < 1e-12)
    assert(math.abs(pr(2L) - (0.05 + 0.85 / 6.0)) < 1e-12)
    assert(math.abs(pr(3L) - (0.05 + 0.85 * (1.0 / 6 + 1.0 / 3))) < 1e-12)
    assert(math.abs(pr.values.sum - 1.0) < 1e-12) // no sinks → conserved
  }

  test("pageRank: sink mass leaves; multi-edges collapse; ≥2 rounds run") {
    // sink node 2 absorbs then leaks mass; duplicate edge must not
    // double the contribution
    val pr = ranks(Seq((1L, 2L), (1L, 2L)), 2)
    assert(math.abs(pr(1L) - 0.075) < 1e-12) // (1-d)/N both rounds
    // round2: 0.075 + 0.85 * pr1(1) = 0.075 + 0.85 * 0.075
    assert(math.abs(pr(2L) - (0.075 + 0.85 * 0.075)) < 1e-12)
    assert(pr.values.sum < 1.0)
  }

  test("pageRank plan stays O(1) deep across rounds (pinned lineage)") {
    // 10 rounds on a cycle: if lineage grew per round, the final plan
    // string would blow up; a pinned loop keeps it a flat scan
    val pr10 = Graph.pageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"),
      "src", "dst", 10)
    val plan = pr10.queryExecution.optimizedPlan.toString
    assert(plan.linesIterator.size < 10, s"plan too deep:\n$plan")
    val pr = pr10.as[(Long, Double)].collect().toMap
    // symmetric cycle stays uniform at 1/3 forever
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }
}
