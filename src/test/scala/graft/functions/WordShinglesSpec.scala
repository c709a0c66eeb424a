package graft.functions

import graft.SparkTestBase
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class WordShinglesSpec extends SparkTestBase {
  import spark.implicits._

  GraftExtensions.installInto(spark)

  test("matches the HOF wordShinglesOf form on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    val diff = docs.select(
        call_function("graft_shingles", $"toks", lit(3)).as("native"),
        TextAnalysis.wordShinglesOf($"toks", 3).as("hof"))
      .where($"native" =!= $"hof").count()
    assert(diff == 0)
  }

  test("short arrays yield empty; n=1 yields the tokens; null → null") {
    val df = Seq(Seq("a", "b"), Seq("a", "b", "c", "d"), null)
      .toDF("toks")
    val got3 = df.select(call_function("graft_shingles", $"toks", lit(3)))
      .collect()
    assert(got3(0).getSeq[String](0) == Seq.empty)
    assert(got3(1).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(got3(2).isNullAt(0))
    val got1 = df.where($"toks".isNotNull)
      .select(call_function("graft_shingles", $"toks", lit(1)))
      .collect()
    assert(got1(0).getSeq[String](0) == Seq("a", "b"))
  }

  test("participates in whole-stage codegen") {
    val df = Seq(Seq("x", "y", "z")).toDF("toks")
      .select(call_function("graft_shingles", $"toks", lit(2)).as("s"))
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen"))
    assert(df.head.getSeq[String](0) == Seq("x y", "y z"))
  }

  test("non-literal width is rejected with a clear error") {
    val df = Seq((Seq("a", "b"), 2)).toDF("toks", "n")
    val e = intercept[Exception](
      df.select(call_function("graft_shingles", $"toks", $"n")).collect())
    assert(e.getMessage.contains("INT literal"))
  }
}
