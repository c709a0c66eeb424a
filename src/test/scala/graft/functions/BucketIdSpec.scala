package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BucketIdSpec extends SparkTestBase {
  import spark.implicits._

  GraftExtensions.installInto(spark)

  test("native BucketId matches floor(pos/width) on non-negative inputs") {
    val df = (0L to 1000L by 7L).flatMap(p => Seq((p, 1L), (p, 13L),
      (p, 100L))).toDF("pos", "w")
    val got = df.select($"pos", $"w",
        BucketId($"pos", $"w").as("native"),
        floor($"pos".cast("double") / $"w").cast("int").as("composed"))
      .where($"native" =!= $"composed").count()
    assert(got == 0)
  }

  test("zero/negative width yields bucket 0, null propagates") {
    val df = Seq((10L, 0L), (10L, -5L)).toDF("pos", "w")
    val got = df.select(BucketId($"pos", $"w")).as[Int].collect().toSet
    assert(got == Set(0))
    val n = Seq((Option.empty[Long], Some(5L))).toDF("pos", "w")
      .select(BucketId($"pos", $"w")).collect().head
    assert(n.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(100).select(BucketId($"id", lit(10L)).as("b"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen"))
    assert(df.agg(sum($"b")).head.getLong(0) ==
      (0 until 100).map(_ / 10).sum)
  }

  test("available from SQL after registration, with int-literal widening") {
    val r = spark
      .sql("SELECT bucket_id(57, 10)") // INT literals widen via the builder
      .head.getInt(0)
    assert(r == 5)
    val e = intercept[Exception](spark.sql("SELECT bucket_id(1)").collect())
    assert(e.getMessage.contains("expects 2 argument"))
  }

  test("graft_fingerprint / graft_token_count SQL functions match the Column API") {
    val rows = spark.sql(
      "SELECT graft_fingerprint('  Hello   World '), graft_token_count('  a b\tc ')")
      .head
    val viaColumn = Seq("  Hello   World ").toDF("t")
      .select(graft.operators.TextAnalysis.fingerprint($"t"),
              graft.operators.TextAnalysis.tokenCount(lit("  a b\tc ")))
      .head
    assert(rows.getString(0) == viaColumn.getString(0))
    assert(rows.getInt(1) == 3 && viaColumn.getInt(1) == 3)
  }
}

class FirstPerKeyAggSpec extends SparkTestBase {
  import spark.implicits._

  test("agg dedup matches window dedup under a total order") {
    val df = Seq((1, 2, 50.0), (1, 1, 50.0), (1, 3, 99.0),
                 (2, 1, 10.0), (2, 2, 10.0)).toDF("k", "ln", "price")
    val win = graft.operators.Dedup.firstPerKey(df, Seq("k"),
      Seq(desc("price"), asc("ln"))).as[(Int, Int, Double)].collect().toSet
    val agg = graft.operators.Dedup.firstPerKeyAgg(df, Seq("k"),
      struct($"price", -$"ln")).as[(Int, Int, Double)].collect().toSet
    assert(win == agg)
    assert(agg == Set((1, 3, 99.0), (2, 1, 10.0)))
  }

  test("agg dedup has map-side partial aggregation") {
    val df = Seq((1, 1, 1.0)).toDF("k", "ln", "price")
    val p = graft.operators.Dedup.firstPerKeyAgg(df, Seq("k"),
      struct($"price", -$"ln")).queryExecution.sparkPlan.toString
    assert(p.contains("partial_max_by") || p.contains("partial_"),
      s"expected partial agg in:\n$p")
  }
}
