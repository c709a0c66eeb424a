package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.operators.Sessionize

/** Canary for event-time ENCODING drift in the driver's data.
  *
  * Round-6 postmortem: the testdata producer switched events.ts from
  * TIMESTAMP(NANOS) (surfaced as Long via nanosAsLong) to timestamp[us]
  * (surfaced as TIMESTAMP_NTZ), and every event-time query failed
  * analysis — while the unit suite, which generates its own fixtures,
  * stayed green. This spec makes the next drift a red test with a name:
  *  - the engine must produce IDENTICAL results from a long-nanos file
  *    and a timestamp[us] file of the same instants;
  *  - the real driver table must normalize to TimestampType and run an
  *    event-time query end-to-end.
  */
class EventTimeEncodingSpec extends SparkTestBase {

  // three instants per user: two 100 s apart (one session at gap=1800 s),
  // one 4000 s later (a second session)
  private val baseSec = 1704067200L // 2024-01-01T00:00:00Z
  private val offsets = Seq(0L, 100L, 4000L)

  private def sessionCounts(eventsDf: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long)] = {
    val e = GraftSession.normalizeEventTime(eventsDf)
    assert(e.schema("ts").dataType == TimestampType,
      s"normalizeEventTime must yield TimestampType, got " +
        e.schema("ts").dataType)
    Sessionize.sessionizeEvents(
        e.select(col("user_id"),
          expr("unix_micros(ts) DIV 1000000").as("t")),
        Seq("user_id"), "t", 1800L)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")),
        r.getLong(r.fieldIndex("sess_start")),
        r.getLong(r.fieldIndex("sess_end"))))
      .toSet
  }

  test("long-nanos and timestamp[us] encodings of the same instants " +
      "produce identical sessions") {
    withTempDir("graft_ts_canary") { dir =>
      import spark.implicits._
      val rows = for (u <- 1L to 3L; off <- offsets)
        yield (u, (baseSec + off) * 1000000000L)
      val nsPath = new java.io.File(dir, "ns").getPath
      val usPath = new java.io.File(dir, "us").getPath
      rows.toDF("user_id", "ts").write.parquet(nsPath)
      rows.toDF("user_id", "ts")
        .select(col("user_id"),
          timestamp_micros(expr("ts DIV 1000")).cast("timestamp_ntz")
            .as("ts"))
        .write.parquet(usPath)

      val nsDf = spark.read.parquet(nsPath)
      val usDf = spark.read.parquet(usPath)
      assert(nsDf.schema("ts").dataType == LongType)
      assert(usDf.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)

      val fromNs = sessionCounts(nsDf)
      val fromUs = sessionCounts(usDf)
      assert(fromNs == fromUs,
        s"encodings diverged: long-ns=$fromNs vs timestamp[us]=$fromUs")
      // two sessions per user, at the expected instants
      assert(fromNs == (1L to 3L).flatMap(u => Seq(
        (u, baseSec, baseSec + 100L),
        (u, baseSec + 4000L, baseSec + 4000L))).toSet)
    }
  }

  test("driver events table normalizes to TimestampType and runs an " +
      "event-time query (encoding-drift canary)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val e = GraftSession.table(spark, dir, "events")
    assert(e.schema("ts").dataType == TimestampType,
      s"driver events.ts normalized to ${e.schema("ts").dataType} — " +
        "the producer's encoding drifted past normalizeEventTime; " +
        "extend GraftSession.normalizeEventTime for the new dtype")
    val sessions = Sessionize.sessionizeEvents(
      e.select(col("user_id"),
        expr("unix_micros(ts) DIV 1000000").as("t")),
      Seq("user_id"), "t", 1800L)
    assert(sessions.limit(1).count() == 1L,
      "event-time sessionization over driver data returned no rows")
  }
}
