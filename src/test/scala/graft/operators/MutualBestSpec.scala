package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MutualBestSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("mutualBestMatch: reciprocal pairs only; hubs excluded") {
    // block 0: v1 and v2 are near-identical (mutual best); v3 points at
    // v1 (its best) but v1's best is v2 → v3 is a one-way match and
    // must NOT pair. Block 1 is a singleton → no pairs.
    val df = Seq(
      (1L, 0, vec(1, 0, 0)),
      (2L, 0, vec(0.99, 0.1, 0)),
      (3L, 0, vec(0.9, -0.4, 0.2)),
      (9L, 1, vec(0, 1, 0))
    ).toDF("id", "blk", "v")
    val got = Similarity.mutualBestMatch(df, "id", "v", "blk")
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("mutualBestMatch equals brute force on random vectors") {
    val rng = new scala.util.Random(17)
    val pts = (1L to 60L).map(i =>
      (i, (i % 3).toInt, Array.fill(8)(rng.nextGaussian().toFloat)))
    val df = pts.toDF("id", "blk", "v")
    val got = Similarity.mutualBestMatch(df, "id", "v", "blk")
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i)
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def best(p: (Long, Int, Array[Float])): Long =
      pts.filter(q => q._2 == p._2 && q._1 != p._1)
        .maxBy(q => (cos(p._3, q._3), -q._1))._1
    val want = (for {
      p <- pts; q <- pts
      if p._1 < q._1 && p._2 == q._2
      if best(p) == q._1 && best(q) == p._1
    } yield (p._1, q._1)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
