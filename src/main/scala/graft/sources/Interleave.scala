package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paired-source interleave — the reference's chunker utility
  * (`chunker/chunker_2.11-1.0.jar`, classes Single/PairedFastqChunker;
  * README.md:119-130): merge two parallel record streams so record i of
  * A is immediately followed by record i of B (paired-end reads).
  *
  * Spark-native: no positional zip of files (row order is not a contract
  * in a distributed table) — the pairing key must be explicit. Given an
  * index column present in both sides, the interleave is a union with a
  * (idx, side) sort key; downstream consumers that need physical
  * adjacency sort within partitions after range-partitioning on idx, so
  * the global order exists without a single-task gather.
  */
object Interleave {

  def pairInterleave(a: DataFrame, b: DataFrame, idxCol: String)
      : DataFrame = {
    require(!a.columns.contains("_side") && !b.columns.contains("_side"),
      "inputs must not carry a _side column")
    val l = a.withColumn("_side", lit(0))
    val r = b.withColumn("_side", lit(1))
    l.unionByName(r)
      .repartitionByRange(col(idxCol))
      .sortWithinPartitions(col(idxCol), col("_side"))
      .drop("_side")
  }
}
