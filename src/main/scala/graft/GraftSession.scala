package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      // the driver's events.parquet stores ts as TIMESTAMP(NANOS), which
      // vanilla Spark refuses; read as Long nanoseconds and convert with
      // exact integer arithmetic (see SparkEntry.eventTimestamp).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reliable checkpoints (Components' reliable=true rounds) are
      // NOT removed by default — without this, every superseded round
      // leaks a full frame copy in the checkpoint dir for the life of
      // the job. With it, the ContextCleaner deletes a checkpoint's
      // files once its RDD becomes unreachable — the same
      // released-when-superseded lifetime localCheckpoint blocks get.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")

  /** Read one of the driver-provided parquet tables from an sf directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
