package graft.functions

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  GraftExtensions.installInto(spark)

  private def nd(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column) =
    call_function("graft_dot", a, b)

  test("matches the HOF fold bit-for-bit on float arrays") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 200).map { i =>
      (Array.fill(64)(rnd.nextFloat() - 0.5f),
       Array.fill(64)(rnd.nextFloat() - 0.5f))
    }.toDF("a", "b")
    val diff = df.select(
        nd($"a", $"b").as("native"),
        Similarity.dot($"a", $"b").as("hof"))
      .where($"native" =!= $"hof" ||
             $"native".isNull =!= $"hof".isNull)
      .count()
    assert(diff == 0)
  }

  test("degenerate cases mirror zip_with+aggregate: mismatch/null → NULL") {
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)),        // 1*3 + 2*4 = 11
      (Array(1f, 2f, 3f), Array(1f, 1f)),    // length mismatch
      (Array.empty[Float], Array.empty[Float]) // empty → 0
    ).toDF("a", "b")
    val got = df.select(nd($"a", $"b")).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 0.0)
    // null element → NULL (zip_with product absorbs it)
    val withNullElem = spark.sql(
      "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(1 AS FLOAT)))")
    assert(withNullElem.head.isNullAt(0))
    // null array → NULL
    assert(spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), " +
      "array(CAST(1 AS FLOAT)))").head.isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    val df = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
      .select(nd($"a", $"b").as("d"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen"))
    assert(df.head.getDouble(0) == 11.0)
  }
}
