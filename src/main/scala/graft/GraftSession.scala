package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Session factory + table access for the graft engine.
  *
  * The engine is a library on top of `org.apache.spark.sql`: every operator
  * declares a logical plan (DataFrame/Dataset transformations) and Catalyst
  * picks the physical strategy. Config defaults here are the scale-oriented
  * ones we would ship on a real cluster (AQE on, skew-join handling on);
  * `shufflePartitions` is sized by the caller (32 for local[32] testing,
  * thousands on a 1000-executor cluster).
  */
object GraftSession {

  /** Build a local session for tests/benchmarks. */
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession =
    configure(
      SparkSession.builder().master(s"local[$cores]"),
      shufflePartitions
    ).getOrCreate()

  /** Apply engine defaults to any builder (local or cluster). */
  def configure(
      b: SparkSession.Builder,
      shufflePartitions: Int
  ): SparkSession.Builder =
    b.appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // typed Aggregators (ObjectHashAggregate) fall back to SORT-based
      // aggregation after 128 distinct keys per partition by default —
      // that turns a hash aggregate into a full sort. Our object buffers
      // (interval lists) are small; raise the fallback accordingly.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
              "131072")
      .config("spark.sql.session.timeZone", "UTC")
      // the codegen class cache (StaticSQLConf, default 100 entries) is
      // an LRU keyed by generated source: a workload that cycles through
      // hundreds of distinct plans — this library serves 290 — evicts
      // every query's classes before it runs again, so each execution
      // pays full janino recompilation (~0.2-0.4 s even on sub-second
      // queries; measured 41% off a 20-query interleaved block when
      // raised). Size it to the library's working set; entries are
      // source+class (tens of KB), so 4096 is a few hundred MB worst
      // case against the driver heap.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      // streaming state lives in RocksDB, not the in-heap
      // HDFSBackedStateStore: a symmetric stream-stream join keeps 4
      // state stores per shuffle partition (q78's profile: 128 stores
      // at 32 partitions), and at production rates in-heap state both
      // competes with execution memory and stalls in GC. RocksDB keeps
      // state off-heap with incremental checkpointing — the provider a
      // 100 TB stream actually ships with (rocksdbjni is bundled with
      // the Spark distribution).
      .config("spark.sql.streaming.stateStore.providerClass",
              "org.apache.spark.sql.execution.streaming.state." +
                "RocksDBStateStoreProvider")
      // RocksDB commits upload a FULL state snapshot per store per
      // micro-batch by default; changelog checkpointing writes the
      // batch's delta instead and snapshots in the background — the
      // recommended production mode at scale (commit cost tracks
      // changed rows, not state size) and a measured win here too:
      // r18 in-session A/B over 8 stateful queries at sf0.1, 3
      // interleaved reps each: median ratio 0.86 (q197 0.74,
      // q55/q172 0.83, q49 0.87, q43 0.89, q78 0.96). Recovery
      // semantics unchanged (changelog replays onto the last
      // snapshot); results unchanged (oracle-checked).
      .config("spark.sql.streaming.stateStore.rocksdb." +
              "changelogCheckpointing.enabled", "true")
      // stream-stream joins keep FOUR state stores per shuffle
      // partition in format v2 (left/right × keyToNumValues/
      // keyWithIndexToValue) — 128 RocksDB instances at 32 partitions,
      // each paying open+commit per micro-batch. Format v3 (Spark 4)
      // backs all four with ONE store per partition via virtual column
      // families: same rows, quarter the per-batch store machinery and
      // a quarter of the instances a 100 TB join keeps open. Measured
      // r18 (in-session A/B, 3 interleaved reps): q78 8.97 → 4.53 s,
      // q205 10.2 → 5.2 s — 0.51× both. Outputs oracle-checked
      // identical (the format changes the checkpoint layout, not the
      // join semantics).
      .config("spark.sql.streaming.join.stateFormatVersion", "3")
      // producers have shipped events.ts as TIMESTAMP(NANOS) in the past,
      // which vanilla Spark refuses to read; with nanosAsLong those files
      // surface as Long nanoseconds and normalizeEventTime converts them
      // with exact integer arithmetic. Harmless for micro-encoded files.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reliable checkpoints (Components' reliable=true rounds) are
      // NOT removed by default — without this, every superseded round
      // leaks a full frame copy in the checkpoint dir for the life of
      // the job. With it, the ContextCleaner deletes a checkpoint's
      // files once its RDD becomes unreachable — the same
      // released-when-superseded lifetime localCheckpoint blocks get.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      // the engine's SparkSessionExtensions: native function kernels +
      // the RangeJoinRewrite optimizer rule (rule is conf-gated, so
      // registering it is free until a query opts in)
      .config("spark.sql.extensions",
              "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Read one of the driver-provided parquet tables from an sf directory,
    * with the event-time column normalized (see [[normalizeEventTime]]).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeEventTime(rawTable(spark, sfDir, name))

  /** Read a table exactly as encoded on disk — no event-time
    * normalization. Streaming sources need this schema (a stream must be
    * given the FILE schema, then normalized post-load with
    * [[normalizeEventTime]], which is a plain projection and so works on
    * streaming frames too).
    */
  def rawTable(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Lenient event-time ingest: producers encode the `ts` column
    * differently across dataset versions — Long nanoseconds (legacy
    * TIMESTAMP(NANOS) files read via nanosAsLong), `timestamp[us]`
    * without a zone (Spark reads TIMESTAMP_NTZ), or a zoned timestamp.
    * Normalize all three to TimestampType at the read boundary so every
    * downstream operator sees one type. The session timezone is pinned
    * UTC (see [[configure]]), so the NTZ→LTZ cast is wall-clock identity
    * and integer epoch arithmetic agrees across encodings.
    */
  def normalizeEventTime(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (!df.columns.contains(tsCol)) df
    else df.schema(tsCol).dataType match {
      case LongType => // legacy nanos: integer DIV keeps exactness at 1e18
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol DIV 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }
}
