package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on $SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are forced through the `noop` sink so
  * every column is fully computed (a `count()` would let Catalyst prune
  * the work away and flatter the numbers).
  *
  * NOISE ROBUSTNESS: each query runs `reps` times (default 3,
  * $SPARK_GRAFT_BENCH_REPS to override) and the reported per-query
  * number is the MEDIAN of its runs — a single-shot timing let one
  * transient machine stall inflate a 0.7 s query to 13.9 s in a recorded
  * run. The JSON also carries per-query spread (max − min across reps)
  * so a reader can see how trustworthy each median is.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
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
        val times = (1 to reps).flatMap { _ =>
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
          if (ok) Some(elapsed) else None
        }
        // any failed rep marks the query failed — a partial median would
        // silently blend successful and failed executions
        (name, times, times.length == reps)
    }
    // a failed query reports -1 and is EXCLUDED from the total — folding
    // its time-to-failure in would silently report a total over a
    // partially-failed run.
    val qs = results.map { case (k, ts, ok) =>
      "\"" + k + "\":" + (if (ok) median(ts) else -1) }.mkString("{", ",", "}")
    val spread = results.collect { case (k, ts, true) if ts.nonEmpty =>
      "\"" + k + "\":" + (ts.max - ts.min) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts, true) => median(ts) }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"reps":$reps,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
