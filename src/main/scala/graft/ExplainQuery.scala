package graft

/** Builder tooling: print the formatted physical plan of one registered
  * query against a data dir, then time N back-to-back executions (full
  * materialization via collect of the count — no output forcing
  * subtleties, this is a plan-reading aid, not a bench). Exists because
  * adjudicating a gate flag always starts with "what plan did it pick
  * at THAT scale" — and at a staged scale point the plan can differ
  * from sf0.1's (AQE decisions, broadcast flips) in ways no sf0.1
  * explain shows.
  *
  * Usage: runMain graft.ExplainQuery <queryName> [sfDir] [reps]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery <queryName> [sfDir] [reps]")
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    fn(spark, sf).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime
      val n = fn(spark, sf).collect().length
      println(s"[explainq] rep=$i rows=$n wall=" +
        f"${(System.nanoTime - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
