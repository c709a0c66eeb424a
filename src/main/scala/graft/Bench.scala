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
  * run. Queries whose spread (max − min) exceeds their own median get up
  * to 2 extra reps before the median is taken — a spread that large is
  * contention evidence, and one more sample per outlier restores the
  * median. The JSON carries the per-query spread so a reader can see
  * how trustworthy each number is.
  *
  * FAILURE CONTAINMENT: a query that fails its first rep is NOT retried
  * — a pathological query (an OOM with minutes of GC thrash) must cost
  * one rep, not reps× its time-to-failure; it reports -1 and is excluded
  * from the total. Every query's result is also echoed to stderr AS IT
  * COMPLETES, so a run killed by an external timeout still leaves every
  * finished number behind (round 4 recorded nothing because one bad
  * query tripled its damage and blew the harness limit).
  *
  * STREAMING WARM-UP: the first streaming query of a run pays the
  * one-time micro-batch machinery cost (state-store init, streaming-
  * specific codegen) — recorded runs swung 10-60× across rounds on
  * streaming medians for harness reasons, not engine reasons. One
  * throwaway drain before the timed loop absorbs it.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
  }

  /** Published number for a query's rep times. Normally the plain
    * median; when the spread STILL exceeds the median after the
    * adaptive extra reps (persistent host contention — a recorded run
    * published 17.2 s for a query that re-measures at 5.7 s on an idle
    * machine), the median of the best 3 runs: contention only ever
    * inflates a timing, so the fastest runs are the ones measuring the
    * query rather than the neighbors. The JSON also carries the PLAIN
    * median per query (`"plain"`) so best-3 numbers are never silently
    * compared against plain-median baselines — a noisy genuine
    * regression must show up in at least one of the two series, and
    * benchgate treats its NOISY status as a mandatory re-run, not a
    * pass.
    */
  private def publish(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0
    else if (xs.max - xs.min > median(xs)) median(xs.sorted.take(3))
    else median(xs)

  private def plainMedian(xs: Seq[Double]): Double =
    if (xs.isEmpty) -1.0 else median(xs)

  /** See [[HostCal]] — emitted as `hostcal_ms` in the bench artifact
    * so benchgate can normalize its growth threshold by host speed.
    */
  private def hostcalMs(): Double = HostCal.hostcalMs()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.toSet
    // ORDER MODE: alphabetical by default (stable round-over-round
    // diffs); $SPARK_GRAFT_BENCH_SHUFFLE=<seed> runs a seeded random
    // order instead — the diagnostic for "is this regression the query
    // or its run-order neighbors?" (round 9's 6-query contiguous
    // regression block). Same seed → same order, so a shuffled run is
    // still reproducible.
    val baseOrder = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.isEmpty || only(q._1))
    val selected = sys.env.get("SPARK_GRAFT_BENCH_SHUFFLE") match {
      case Some(seed) =>
        // a malformed seed must not abort the whole run before any
        // query executes — warn and fall back to alphabetical order
        scala.util.Try(seed.trim.toLong) match {
          case scala.util.Success(s) =>
            new scala.util.Random(s).shuffle(baseOrder)
          case scala.util.Failure(_) =>
            System.err.println(s"[bench] SPARK_GRAFT_BENCH_SHUFFLE=" +
              s"'$seed' is not a long; running alphabetical order")
            baseOrder
        }
      case None => baseOrder
    }
    // JIT/codegen warm-up so per-query numbers measure the plan, not the
    // first-call compilation overhead; plus one throwaway streaming
    // drain if any streaming query is in the run (see class doc).
    def runOnce(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    runOnce("q1_agg")
    selected.collectFirst { case (n, _) if n.contains("stream") => n }
      .foreach(runOnce)
    spark.catalog.clearCache()
    // calibrate BEFORE and AFTER the query loop: round 11's host slowed
    // ~7% DURING the session (1950 -> 2090 ms on the python twin), so a
    // single start-of-run sample under-reports the tax the later
    // queries actually paid; the published number is the mean of both.
    val hostcalStart = hostcalMs()
    System.err.println(s"[bench] hostcal_ms_start=$hostcalStart")
    val results = selected.map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      var rep = 0
      // ADAPTIVE RE-MEASURE: when the spread across reps exceeds the
      // median itself, at least one rep was machine contention, not the
      // query (a recorded run showed 42 s for a 3.8 s query — its own
      // 4.8 s spread already said so). Up to `maxExtra` extra reps make
      // the median robust to a single outlier instead of publishing it.
      val maxExtra = 2
      def noisy = times.nonEmpty && (times.max - times.min) > median(times.toSeq)
      // fail fast: one failed rep marks the query failed and stops —
      // re-proving a failure reps× is what erased round 4's numbers
      while (!failed &&
             (rep < reps || (rep < reps + maxExtra && noisy))) {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          times += (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed = true
        }
        // operators may persist intermediates (their cost is inside the
        // timed region); drop them so queries don't degrade each other.
        spark.catalog.clearCache()
        // a drained streaming query leaves its state-store providers
        // LOADED (RocksDB instances with native memory + background
        // compaction) until the maintenance thread's next eviction —
        // and bench checkpoints are never reused, so they are pure
        // neighbor tax: rounds 9 and 12 both measured a contiguous
        // post-streaming block of small queries inflating 2-4× in full
        // runs only. Unload them while the clock is stopped.
        org.apache.spark.sql.GraftSqlBridge.unloadStateStores()
        rep += 1
      }
      // GC BARRIER: clearCache drops the blocks but the heap garbage
      // (and any humongous-region fragmentation) from one query
      // otherwise taxes its run-order neighbors — round 9 recorded a
      // contiguous block of 6 alphabetical neighbors regressing 3-8x
      // with no plan change. One explicit collection between queries
      // makes each number start from a quiet heap.
      System.gc()
      val med = if (failed) -1.0 else publish(times.toSeq)
      // incremental checkpoint: a killed run keeps every finished number
      System.err.println(f"[bench] $name median=$med%.4f " +
        f"spread=${if (failed || times.isEmpty) -1.0 else times.max - times.min}%.4f")
      (name, times.toSeq, !failed)
    }
    // a failed query reports -1 and is EXCLUDED from the total — folding
    // its time-to-failure in would silently report a total over a
    // partially-failed run.
    val qs = results.map { case (k, ts, ok) =>
      "\"" + k + "\":" + (if (ok) publish(ts) else -1) }.mkString("{", ",", "}")
    val spread = results.collect { case (k, ts, true) if ts.nonEmpty =>
      "\"" + k + "\":" + (ts.max - ts.min) }.mkString("{", ",", "}")
    val plain = results.collect { case (k, ts, true) if ts.nonEmpty =>
      "\"" + k + "\":" + plainMedian(ts) }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts, true) => publish(ts) }.sum
    val hostcalEnd = hostcalMs()
    System.err.println(s"[bench] hostcal_ms_end=$hostcalEnd")
    val hostcal = math.round((hostcalStart + hostcalEnd) / 2 * 10.0) / 10.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"plain":$plain,"spread":$spread,"reps":$reps,"failed":$failed,"hostcal_ms":$hostcal,"hostcal_ms_start":$hostcalStart,"hostcal_ms_end":$hostcalEnd,"sf":"$sfDir"}"""
    // DURABLE ARTIFACT: the harness records a bounded TAIL of stdout
    // (~2000 chars), and with 270+ queries the full one-line JSON
    // outgrows that window by >10x — rounds 3-9 recorded `parsed: null`
    // because the line's head (including the total) was truncated away.
    // The FULL JSON therefore goes to a file (bench_out.json, committed
    // per round), to stderr (unbounded in the harness log), and stdout
    // gets a COMPACT line that fits the tail window whole: total +
    // failures + the slowest 25 queries + a pointer to the full file.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
      java.nio.file.Files.write(out,
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full JSON written to ${out.toAbsolutePath}")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    System.err.println(json)
    val slowest = results.collect { case (k, ts, true) if ts.nonEmpty =>
      (k, publish(ts)) }.sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$slowest,"n_queries":${results.size},"n_reported":${results.count(_._3)},"queries_truncated_to_slowest":25,"full":"bench_out.json","reps":$reps,"failed":$failed,"hostcal_ms":$hostcal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
