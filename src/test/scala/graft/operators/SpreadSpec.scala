package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Pins [[Spread]]'s contract: widen few-partition inputs ahead of
  * CPU-heavy per-row derivation, pass big inputs through with NO added
  * exchange, and — the documented trade — fall back to an exact
  * driver-side partition check only when optimizer stats are the
  * UNKNOWN sentinel (typed lineage), never guessing from a
  * Long.MaxValue "estimate".
  */
class SpreadSpec extends SparkTestBase {
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }.size

  test("single-partition parquet input is widened to the shuffle width") {
    withTempDir("spread") { dir =>
      (1L to 100L).toDF("id").coalesce(1)
        .write.parquet(s"${dir.getAbsolutePath}/t")
      val in = spark.read.parquet(s"${dir.getAbsolutePath}/t")
      val out = Spread(in)
      assert(out.rdd.getNumPartitions ==
        spark.sessionState.conf.numShufflePartitions)
      assert(out.as[Long].collect().sorted.toSeq == (1L to 100L))
    }
  }

  test("already-wide input passes through without an added exchange") {
    val wide = spark.range(1000)
      .repartition(spark.sessionState.conf.numShufflePartitions * 2)
      .toDF("id")
    // stats after an explicit repartition are known and large enough
    val out = Spread(wide)
    assert(shuffles(out) == shuffles(wide),
      "Spread added an exchange to a big input")
  }

  test("UNKNOWN-stats lineage takes the exact fallback, stays correct") {
    // an external-RDD frame carries no size stats (defaultSizeInBytes
    // sentinel); the fallback must measure real partitions rather than
    // skip the spread on a Long.MaxValue-ish "estimate"
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val rdd = spark.sparkContext.parallelize((1L to 50L).map(Row(_)), 1)
    val ext = spark.createDataFrame(rdd,
      StructType(Seq(StructField("id", LongType))))
    val stats = ext.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(stats >= spark.sessionState.conf.defaultSizeInBytes,
      s"expected sentinel stats, got $stats — test premise broke")
    val out = Spread(ext)
    assert(out.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    assert(out.as[Long].collect().sorted.toSeq == (1L to 50L))
  }
}
