package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // extra args = focused run (local iteration); the driver passes two
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the ONE engine config path — hand-rolling the builder here once
    // silently dropped the objectHashAggregate fallback threshold (and
    // AQE) from the graded verify run
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop operator-persisted intermediates between queries, and
      // unload drained streaming queries' state-store providers (never
      // reused — each drain stages a fresh checkpoint; see Bench)
      spark.catalog.clearCache()
      org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
    }
    writeOracleJson(outDir)
    spark.stop()
    // LINGER DIAGNOSIS (VERDICT r15 #6): an sf0.1 run intermittently
    // left the JVM alive after main returned (outputs complete). The
    // r16 repro attempt exited cleanly, so instead of guessing, every
    // run now prints any surviving non-daemon thread WITH its stack —
    // the next occurrence is its own diagnosis instead of a ritual
    // caveat. Nothing is forcibly killed: outputs are already on disk
    // and a kill could mask a real leak.
    val lingering = Thread.getAllStackTraces.entrySet().toArray
      .map(_.asInstanceOf[java.util.Map.Entry[Thread, Array[StackTraceElement]]])
      .filter { e =>
        val t = e.getKey
        t.isAlive && !t.isDaemon && t.getName != "main" &&
          t.getName != "DestroyJavaVM"
      }
    if (lingering.nonEmpty) {
      System.err.println(s"[verify] ${lingering.length} non-daemon " +
        "thread(s) still alive after spark.stop() — JVM will linger:")
      lingering.foreach { e =>
        System.err.println(s"[verify]   ${e.getKey.getName} " +
          s"(state=${e.getKey.getState})")
        e.getValue.take(12).foreach(f =>
          System.err.println(s"[verify]     at $f"))
      }
    }
  }

  /** Dumps SparkEntry.oracleSql as `<outDir>/oracle_sql.json` — shared
    * with [[Concurrent]] so selfcheck.py gates both output layouts.
    * JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  private[graft] def jsonQ(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private[graft] def writeOracleJson(outDir: String): Unit = {
    def q(s: String): String = jsonQ(s)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
