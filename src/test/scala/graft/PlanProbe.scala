package graft

/** Dev utility: print the executed plan of any registered queries.
  *
  * {{{
  * sbt "Test/runMain graft.PlanProbe q106_apply_changeset q107_token_budget"
  * }}}
  *
  * This is how PlanSpec pins get written: probe the plan, decide which
  * nodes are load-bearing for scale, then assert exactly those.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sf)
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
