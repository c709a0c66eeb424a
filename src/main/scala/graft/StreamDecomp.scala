package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Builder tooling (r18): per-micro-batch duration breakdown for one
  * registered streaming query — attaches a StreamingQueryListener and
  * prints each progress event's durationMs map (triggerExecution,
  * addBatch, getBatch, walCommit, commitOffsets, queryPlanning) plus
  * state-operator rows/memory, so the streaming wall decomposes into
  * machinery vs work instead of being guessed at.
  *
  * Usage: runMain graft.StreamDecomp <queryName> [sfDir] [reps]
  */
object StreamDecomp {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamDecomp <queryName> [sfDir] [reps]")
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        System.err.println(s"[sdecomp] started ${e.name} at ${e.timestamp}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        System.err.println(s"[sdecomp] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=$dur " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")} " +
          s"commitMs=${p.stateOperators.map(_.commitTimeMs).mkString(",")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        System.err.println(s"[sdecomp] terminated")
    }
    spark.streams.addListener(listener)
    val fn = SparkEntry.queries(name)
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sf).write.format("noop").mode("overwrite").save()
      System.err.println(f"[sdecomp] rep=$rep total=${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
      org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
      System.gc()
    }
    spark.stop()
  }
}
