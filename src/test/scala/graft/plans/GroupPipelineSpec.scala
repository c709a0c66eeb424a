package graft.plans

import graft.SparkTestBase

class GroupPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // (region, dedupKey, qual, score)
  private val reads = Seq(
    (1, "k1", 30, 10.0), (1, "k1", 60, 11.0), (1, "k2", 5, 12.0),
    (1, "k3", 50, 13.0), (2, "k1", 40, 14.0))

  test("clean → markDup → recalibrate chain runs in one flatMapGroups") {
    val ds = reads.toDS()
    val out = GroupPipeline.run[Int, (Int, String, Int, Double),
                                (Int, String, Int, Double)](
      ds, _._1,
      Seq(
        GroupPipeline.cleanStage[(Int, String, Int, Double)](_._3 >= 10),
        GroupPipeline.markDupStage[(Int, String, Int, Double), String](_._2,
          scala.Ordering.by[(Int, String, Int, Double), Int](r => -r._3)),
        GroupPipeline.recalibrateStage[(Int, String, Int, Double)](r =>
          r.copy(_4 = r._4 * 2))                              // BQSR-ish
      ),
      (k, it) => it
    ).collect().toSet
    assert(out == Set((1, "k1", 60, 22.0), (1, "k3", 50, 26.0),
                      (2, "k1", 40, 28.0)))
  }

  test("empty stage list is identity; finish sees the group key") {
    val ds = reads.toDS()
    val out = GroupPipeline.run[Int, (Int, String, Int, Double), (Int, Long)](
      ds, _._1, Seq.empty,
      (k, it) => Iterator((k, it.size.toLong))
    ).collect().toSet
    assert(out == Set((1, 4L), (2, 1L)))
  }
}
