package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfJoinExecSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.AsOfJoin

  graft.functions.GraftExtensions.installInto(spark)

  test("plan: custom exec node, co-partitioned sort-merge shape") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, 2.0)).toDF("k", "rt", "rv")
    val df = AsOfJoin.asofMergeExec(l, r, Seq("k"), "t", "rt")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin ["), p) // SparkPlan strips "Exec"
    // both children shuffled on the key and sorted (key, time)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
    assert("Sort \\[".r.findAllIn(p).length >= 2, p)
  }

  test("matches: latest right ≤ left time per key; left-outer nulls") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 4L, "early"),
      (2L, 10L, "c"), (3L, 10L, "nokey")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0),
      (2L, 10L, 4.0)).toDF("k", "rt", "rv")
    val got = AsOfJoin.asofMergeExec(l, r, Seq("k"), "t", "rt")
      .select(col("k"), col("t"), col("asof_ts"), col("rv"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2))).sorted.toSeq
    assert(got == Seq((1L, 4L, -1L), (1L, 10L, 10L), (1L, 20L, 15L),
      (2L, 10L, 10L), (3L, 10L, -1L)))
  }

  test("randomized parity with the union-LOCF formulation") {
    val rnd = new scala.util.Random(23)
    val l = (1 to 2000).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    // one row per (key, ts): the shared determinism contract
    val r = (1 to 800).map(i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "rt", "rv")
      .groupBy("k", "rt").agg(max(col("rv")).as("rv"))
    val viaExec = AsOfJoin.asofMergeExec(l, r, Seq("k"), "t", "rt")
      .select(col("k"), col("t"), col("lid"), col("asof_ts"), col("rv"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1.0 else x.getDouble(4))).sorted.toSeq
    val viaUnion = AsOfJoin.asofBackward(l, r, Seq("k"), "t", "rt",
        Seq("rv"))
      .select(col("k"), col("t"), col("lid"), col("asof_ts"), col("rv"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3),
        if (x.isNullAt(4)) -1.0 else x.getDouble(4))).sorted.toSeq
    assert(viaExec == viaUnion && viaExec.nonEmpty)
  }

  test("result is invariant to input partitioning") {
    val l = (1 to 500).map(i => ((i % 7).toLong, (i * 13 % 100).toLong,
      i.toLong)).toDF("k", "t", "lid")
    val r = (1 to 200).map(i => ((i % 9).toLong, (i * 7 % 100).toLong,
      i.toDouble)).toDF("k", "rt", "rv")
      .groupBy("k", "rt").agg(max(col("rv")).as("rv"))
    def run(lp: Int, rp: Int) =
      AsOfJoin.asofMergeExec(l.repartition(lp), r.repartition(rp),
          Seq("k"), "t", "rt")
        .collect().map(_.toSeq).map(_.toString).sorted.toSeq
    assert(run(2, 5) == run(7, 1))
  }

  test("empty right side: all left rows survive with nulls") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val r = Seq.empty[(Long, Long, Double)].toDF("k", "rt", "rv")
    val got = AsOfJoin.asofMergeExec(l, r, Seq("k"), "t", "rt").collect()
    assert(got.length == 1 && got.head.isNullAt(4))
  }
}
