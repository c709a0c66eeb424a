package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("TopKAgg equals the window row_number over many partitionings") {
    val rng = new scala.util.Random(29)
    val rows = (1L to 500L).map(i => ((i % 7).toString,
      rng.nextInt(50).toDouble, i))
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.sparkContext.parallelize(rows, parts)
        .toDF("k", "ord", "id")
      val tk = udaf(TopKAgg(4))
      val got = df.groupBy(col("k"))
        .agg(tk(col("ord"), col("id")).as("top"))
        .select(col("k"), posexplode(col("top")))
        .select(col("k"), col("pos"), col("col.id"))
        .as[(String, Int, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (k, xs) =>
        xs.sortBy(x => (-x._2, x._3)).take(4).zipWithIndex
          .map { case (x, i) => (k, i, x._3) }
      }.toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("TopKAgg: fewer rows than k returns all, ordered") {
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L)).toDF("k", "ord", "id")
    val tk = udaf(TopKAgg(5))
    val got = df.groupBy(col("k"))
      .agg(tk(col("ord"), col("id")).as("top"))
      .select(explode(col("top.id"))).as[Long].collect().toSeq
    assert(got == Seq(2L, 1L))
  }

  test("reduce/merge maintain the bounded sorted invariant directly") {
    val a = new TopKAgg(3)
    val buf = Seq(Kv(5, 1), Kv(1, 2), Kv(3, 3), Kv(3, 1), Kv(9, 9))
      .foldLeft(a.zero)(a.reduce)
    assert(buf == List(Kv(9, 9), Kv(5, 1), Kv(3, 1)))
    val merged = a.merge(buf, List(Kv(7, 7), Kv(3, 0)))
    assert(merged == List(Kv(9, 9), Kv(7, 7), Kv(5, 1)))
  }
}
