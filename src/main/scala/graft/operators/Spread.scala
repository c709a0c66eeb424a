package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Spread a (possibly few-partition) input across the cluster before
  * CPU-heavy per-row derivation: a small parquet file arrives as ONE
  * partition, which would serialize all per-row work — shingle hashing,
  * typed-encoder deserialization, key-function evaluation — onto one
  * core. The partition-count estimate comes from optimizer statistics
  * (scan bytes / maxPartitionBytes) — NOT from `df.rdd.getNumPartitions`,
  * which would force an RDD lineage conversion on the driver per call.
  * Big inputs (est. splits ≥ shuffle partitions) pass through untouched,
  * so at real scale this never shuffles.
  */
object Spread {

  def apply(df: DataFrame): DataFrame = typed(df)

  /** Typed variant (`Dataset[T]` in, same `Dataset[T]` out) — the shape
    * `GroupPipeline` needs: `groupByKey`'s key extraction deserializes
    * every row MAP-SIDE of its exchange, so on a one-split input the
    * whole typed scan would run single-threaded without this.
    */
  def typed[T](ds: Dataset[T]): Dataset[T] = {
    val conf = ds.sparkSession.sessionState.conf
    val target = conf.numShufflePartitions
    val sizeBytes = ds.queryExecution.optimizedPlan.stats.sizeInBytes
    // stats can be UNKNOWN (lineage through typed maps etc. propagates
    // the defaultSizeInBytes sentinel) — an "estimate" of Long.MaxValue
    // would silently skip the spread and serialize the derivation onto
    // however few partitions the input really has; only then pay the
    // exact check. Deliberate trade: the fallback is DRIVER-side
    // physical planning + RDD lineage build (no job, no data movement),
    // and it also fires on legitimately immense estimates (join-product
    // stats, a lowered defaultSizeInBytes) — indistinguishable from the
    // sentinel by construction, and strictly safer than guessing.
    val estParts =
      if (sizeBytes >= conf.defaultSizeInBytes)
        ds.rdd.getNumPartitions.toLong
      else (sizeBytes / conf.filesMaxPartitionBytes).toLong + 1
    if (estParts >= target) ds else ds.repartition(target)
  }
}
