package graft

import org.apache.spark.sql.SparkSession

/** Builder tooling (r18): in-session A/B of streaming session confs
  * over the registered streaming queries. Both arms run interleaved in
  * ONE JVM (A, B, A, B, ...) so a host phase cannot masquerade as a
  * conf effect — the same protocol as the r13 streamwidth probe. Each
  * execution gets the bench hygiene (clearCache + state-store unload +
  * gc, clock stopped).
  *
  * Usage: runMain graft.StreamAB <confKey=valA|valB> <reps> <q1,q2,...>
  *        [sfDir]
  */
object StreamAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: StreamAB <confKey=valA|valB> <reps> <q1,q2,...> [sfDir]")
    val Array(confKey, vals) = args(0).split("=", 2)
    val Array(valA, valB) = vals.split("\\|", 2)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
      System.gc()
    }
    // warm-up: one unrecorded execution per query (arm A conf)
    spark.conf.set(confKey, valA)
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      hygiene()
    }
    val times = scala.collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (pass <- 1 to reps; arm <- Seq("A" -> valA, "B" -> valB)) {
      spark.conf.set(confKey, arm._2)
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sf)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        times((n, arm._1)) = times((n, arm._1)) :+ t
        System.err.println(f"[streamab] pass=$pass arm=${arm._1} " +
          f"(${arm._2}) $n t=$t%.3f")
        hygiene()
      }
    }
    def med(xs: List[Double]) = { val s = xs.sorted; s(s.length / 2) }
    println(f"conf=$confKey A=$valA B=$valB reps=$reps")
    names.foreach { n =>
      val a = med(times((n, "A"))); val b = med(times((n, "B")))
      println(f"$n%-32s A=$a%7.3f  B=$b%7.3f  B/A=${b / a}%5.2f  " +
        s"rawA=${times((n, "A")).map(Bench.fmt4)} " +
        s"rawB=${times((n, "B")).map(Bench.fmt4)}")
    }
    spark.stop()
  }
}
