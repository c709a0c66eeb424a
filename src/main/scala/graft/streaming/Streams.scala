package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming equivalents of the reference's micro-batch input
  * loop (`program/src/main/scala/hmushtaq/sparkga1/SparkGA1.scala:94-110,
  * 1050-1081`): the reference polls for `ulStatus/<chunk>` marker files,
  * processes chunks in groups of `chunkerGroupSize`, and stops on an
  * `end.txt` sentinel. Spark-native:
  *  - group size            → `maxFilesPerTrigger` on a file source
  *  - marker protocol       → stream-static semi-join against a marker set
  *  - sentinel + drain      → `Trigger.AvailableNow` (process what exists,
  *                            then stop)
  * plus the north-star event-time operators the reference lacks:
  * watermarked tumbling/sliding windows and session windows.
  */
object Streams {

  /** Micro-batch file source: `maxFilesPerTrigger` ≈ chunkerGroupSize.
    * One file = one input unit, exactly the reference's chunk granularity.
    * `path` must be a DIRECTORY (a streaming-source requirement); select
    * individual files within it via `globFilter`.
    */
  def fileSource(spark: SparkSession, path: String, schema: StructType,
                 format: String = "parquet",
                 maxFilesPerTrigger: Int = 4,
                 globFilter: Option[String] = None): DataFrame = {
    val r = spark.readStream
      .format(format)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
    globFilter.foreach(g => r.option("pathGlobFilter", g))
    r.load(path)
  }

  /** Completion-marker readiness filter: keep only stream rows whose
    * `idCol` appears in the (small, static or periodically refreshed)
    * marker table — the reference's `ulStatus/<chunkNum>` check as a
    * stream-static broadcast semi-join (no state, no shuffle of the
    * stream side).
    */
  def readyFilter(stream: DataFrame, markers: DataFrame, idCol: String)
      : DataFrame =
    stream.join(broadcast(markers.select(col(idCol)).distinct()),
      Seq(idCol), "left_semi")

  /** Stream-static ENRICHMENT join: attach dimension attributes to every
    * stream row (the classic fact-stream × dimension-table shape). The
    * static side is broadcast, so the stream side needs no shuffle and
    * no state — each micro-batch probes the same hash table; Spark
    * re-plans the static side per batch, so a periodically refreshed
    * dimension view is picked up automatically. Default LEFT join keeps
    * stream rows with no dimension match (enrichment must not drop
    * facts); pass "inner" to filter instead.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Watermarked tumbling-window counts/sums over event time. */
  def tumblingAgg(events: DataFrame, tsCol: String, valueCol: String,
                  window: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("n_events"),
           sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("w_start"),
              col("window.end").as("w_end"),
              col("n_events"), col("sum_value"))

  /** Watermarked SLIDING-window counts/sums: each event lands in
    * window/slide overlapping windows, all epoch-aligned to multiples of
    * `slide`. State is O(active windows), not O(events).
    */
  def slidingAgg(events: DataFrame, tsCol: String, valueCol: String,
                 window: String, slide: String, watermark: String)
      : DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window,
        slide))
      .agg(count(lit(1)).as("n_events"),
           sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("w_start"),
              col("window.end").as("w_end"),
              col("n_events"), col("sum_value"))

  /** Stateful streaming exact dedup: first row per key wins, state holds
    * one entry per distinct key. The streaming twin of
    * NearDup.exactDedupClasses' fingerprint dedup — at corpus scale pair
    * it with a watermark on an event-time column so state can age out.
    */
  def streamDedup(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  /** Gap-based session windows over event time — the streaming analog of
    * the batch interval-coalescing operator (RegionIterator.java:101-132).
    */
  def sessionAgg(events: DataFrame, keyCols: Seq[String], tsCol: String,
                 gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .select(keyCols.map(col) ++ Seq(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_rows")): _*)

  /** Watermarked STREAM-STREAM interval join: match right-stream rows to
    * left-stream rows with equal keys whose event time falls in
    * [leftTs, leftTs + band] — the correlate-two-feeds shape (request/
    * response pairing, start/finish events). Both sides are watermarked
    * and the join condition carries the event-time band, so Spark can
    * evict buffered rows once the watermark passes leftTs + band: state
    * is O(rows inside watermark + band), NOT O(stream history) — the
    * property that keeps this runnable forever at production rates.
    * Append output mode. Key columns are emitted once (the left
    * side's); callers keep non-key column names disjoint.
    *
    * `joinType` "inner" (default) or "left_outer": the outer form
    * emits an unmatched left row WITH NULL right columns only once
    * the watermark proves no match can still arrive — so a drain that
    * must surface ALL unmatched rows needs the source to carry a
    * far-future sentinel row per side that pushes the final watermark
    * past every real row + band (the reference's `end.txt` semantics,
    * in-band; q205 stages exactly that).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, band: String,
                   watermark: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k"))
      .reduce(_ && _)
    val timeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $band")
    keys.foldLeft(l.join(r, keyCond && timeCond, joinType)) {
      (d, k) => d.drop(col(s"r.$k"))
    }
  }

  /** Session clone with the final NO-DATA micro-batch disabled — for
    * drain-then-stop queries whose OUTPUT provably does not depend on
    * watermark-time eviction: complete-mode aggregations (the sink
    * holds the full aggregate either way — eviction in the trailing
    * batch only drops upstream dedup/agg state, emitting nothing) and
    * watermarked INNER stream-stream joins (eviction drops buffered
    * rows; only OUTER joins emit at eviction). The trailing no-data
    * batch costs a full state-store commit cycle across every store of
    * every partition — measured r18 at sf0.1: q78's was 4-6 s of a 9 s
    * wall, q197's 1.6-1.9 s of 4.5 s — pure machinery for these
    * queries at ANY scale (a 100 TB drain pays it across thousands of
    * stores).
    *
    * Queries whose output IS emitted at eviction MUST NOT use this:
    * left-outer joins (q205's sentinel-driven unmatched-row flush),
    * append-mode windowed aggregations (q88's file sink), event-time
    * timeouts (q49's session closer). Per-query opt-in, never a
    * session default.
    *
    * A CLONED session, not a set/unset on the shared session: a
    * streaming query snapshots the session conf when it STARTS, so a
    * shared-session toggle races against a concurrently starting query
    * in the multi-stream (Concurrent) deployment — and q205 started in
    * that window would silently lose its eviction batch. The clone
    * also scopes the memory-sink temp view; read results via the
    * RETURNED session.
    */
  def noEvictionDrainSession(s: SparkSession): SparkSession = {
    val sd = s.newSession()
    // newSession starts from the SparkConf defaults, not the parent's
    // RUNTIME session conf — copy it so the drain keeps the engine's
    // streaming/shuffle settings (state-store provider, join state
    // format, shuffle width) in every environment, including test
    // suites that configure a session over an existing context. Static
    // confs refuse runtime set — skip them (they are shared anyway).
    s.conf.getAll.foreach { case (k, v) =>
      try sd.conf.set(k, v) catch { case _: Throwable => () }
    }
    sd.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    sd
  }

  /** Drain-then-stop writer: processes all available input then stops —
    * the reference's `end.txt` sentinel semantics without sideband files.
    * `outputMode`: "complete" for aggregations, "append" for
    * row-emitting stateful ops (dropDuplicates, flatMapGroupsWithState).
    */
  def drainToMemory(df: DataFrame, queryName: String,
                    outputMode: String = "complete")
      : DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())

  /** Drain-then-stop FILE sink — the production output shape: parquet
    * part files plus a checkpoint directory, giving exactly-once output
    * across restarts (the sink's commit log records which batch wrote
    * which files; a restarted query resumes from the checkpoint instead
    * of re-emitting). The memory sink above is for tests/oracles; this
    * is what a 100 TB pipeline actually writes to. Append mode by
    * definition (file sinks cannot retract).
    */
  def drainToFiles(df: DataFrame, outPath: String, checkpointPath: String,
                   format: String = "parquet"): DataStreamWriter[Row] =
    df.writeStream
      .format(format)
      .option("path", outPath)
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
}
