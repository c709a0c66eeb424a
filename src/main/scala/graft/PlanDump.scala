package graft

/** Builder tooling (r18 optimization round): dump `explain("formatted")`
  * for a list of registered queries into one file per query, all from a
  * single session — the per-round `plans/rNN/<query>_{before,after}.txt`
  * deliverable generator. One JVM for the whole list (ExplainQuery pays
  * ~25 s of spin-up per query; a 20-query capture should not cost 8
  * minutes of JVM starts).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  *   writes <outDir>/<query>_<suffix>.txt for each query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // iterative operators execute their pinned rounds at CONSTRUCTION
      // (Components.pin is an eager localCheckpoint), so the final
      // frame's explain is just a LogicalRDD scan; the real plan
      // evidence is each pinned round's executed plan — captured via
      // the existing test hook.
      graft.operators.Components.PinPlanCapture.start()
      val df = fn(spark, sf)
      val pinPlans = graft.operators.Components.PinPlanCapture.stop()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pinsSection =
        if (pinPlans.isEmpty) ""
        else pinPlans.zipWithIndex.map { case (p, i) =>
          s"\n\n== Pinned round ${i + 1} (executed plan at construction) ==\n$p"
        }.mkString
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        (plan + pinsSection)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] wrote $name ($suffix)")
      // a query fn may leave behind persisted intermediates or loaded
      // state-store providers (streaming drains execute at construction)
      spark.catalog.clearCache()
      org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
    }
    spark.stop()
  }
}
