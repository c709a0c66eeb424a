package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on $SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` sink so
  * every column is fully computed (a `count()` would let Catalyst prune
  * the work away and flatter the numbers).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warm-up so per-query numbers measure the plan, not the
    // first-call compilation overhead.
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1)).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // operators may persist intermediates (their cost is inside the
        // timed region); drop them so queries don't degrade each other.
        spark.catalog.clearCache()
        (name, elapsed, ok)
    }
    // a failed query reports -1 and is EXCLUDED from the total — folding
    // its time-to-failure in would silently report a total over a
    // partially-failed run.
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) v else -1) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
