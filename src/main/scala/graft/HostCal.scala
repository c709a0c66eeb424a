package graft

/** Host-speed calibration: a fixed single-threaded CPU workload whose
  * wall time moves with the machine, never with the engine — the
  * in-JVM twin of scripts/hostcal.py. [[graft.Bench]] emits its
  * measurement as `hostcal_ms` in every bench artifact so
  * scripts/benchgate.py can normalize its growth threshold by the
  * host-speed ratio instead of a human re-adjudicating host noise every
  * round (it happened rounds 9, 10 AND 11).
  *
  * The checksum assert keeps the workload FIXED across rounds — a
  * drifted loop would silently re-zero every calibration comparison.
  * Best-of-3 after a JIT warm-up rep: contention only ever inflates a
  * timing, so the minimum measures the machine.
  */
object HostCal {
  /** FNV-style integer hash fold — immune to BLAS/SIMD variance,
    * deterministic on any JVM (Long overflow is defined wrap-around).
    */
  private[graft] def workload(n: Long): Long = {
    var h = 1469598103934665603L; var acc = 0L; var i = 0L
    while (i < n) {
      h = (h ^ i) * 1099511628211L
      acc = (acc + h) % 1000000007L
      i += 1
    }
    acc
  }

  /** The fixed measurement size and its pinned checksum. */
  private[graft] val measureN = 64000000L
  private[graft] val expected = 323266195L

  def hostcalMs(): Double = {
    workload(8000000L) // JIT warm-up (C2 compile before the timed reps)
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val r = workload(measureN)
      require(r == expected, s"hostcal workload drifted: $r")
      (System.nanoTime() - t0) / 1e6
    }
    math.round(times.min * 10.0) / 10.0
  }

  /** Parallel leg: `parTasks` simultaneous copies of the same fixed fold
    * as ONE 32-task Spark stage, plus a fixed 32-partition shuffle of the
    * 32 results (scheduler + exchange machinery in the measurement). The
    * single-thread leg cannot see multi-tenant CPU contention: round 12
    * measured driver 296.9 s vs builder 284.6 s at near-identical
    * single-thread hostcal (276.5 vs 273.4 ms) — the ~4% residual lives
    * in the parallel regime the bench actually runs in. Best-of-3 after
    * a warm-up rep, like the scalar leg; checksum-pinned so the workload
    * can never drift silently.
    */
  private[graft] val parTaskN = 16000000L
  private[graft] val parTasks = 32
  private[graft] val parExpected = 1471524480L // = parTasks * workload(parTaskN)

  def hostcalParMs(spark: org.apache.spark.sql.SparkSession): Double = {
    val sc = spark.sparkContext
    def leg(): Double = {
      val t0 = System.nanoTime()
      val total = sc.parallelize(0 until parTasks, parTasks)
        .map(_ => workload(parTaskN))
        .repartition(parTasks)
        .fold(0L)(_ + _)
      require(total == parExpected,
        s"hostcal parallel workload drifted: $total")
      (System.nanoTime() - t0) / 1e6
    }
    leg() // warm-up (task codegen/JIT before the timed reps)
    val times = (1 to 3).map(_ => leg())
    math.round(times.min * 10.0) / 10.0
  }
}
