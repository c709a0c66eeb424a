package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources and sinks.
  *
  * Reference sinks: per-(chr,region) chunk files with manual 4 MB block
  * packing + manifest bookkeeping (`program/src/main/scala/hmushtaq/
  * sparkga1/SparkGA1.scala:65,150-214`) and a driver-side single combined
  * VCF (`SparkGA1.scala:1242-1251`). Spark-native: `partitionBy` writes
  * (block packing, manifests, and offsets disappear — the committer and
  * Parquet row groups do it), and a `coalesce(1)` write for the
  * single-file gather. Partitioned layout gives partition PRUNING on
  * read: a reader filtering on the partition key scans only matching
  * directories — the reference's "Part 3 reads only its region's files"
  * for free.
  *
  * Lenient text ingest (reference §1.3: malformed rows counted-and-
  * dropped, `SamRegionsParser.scala:71-74`): PERMISSIVE mode with a
  * corrupt-record column reproduces count-don't-fail.
  */
object Sinks {

  /** Key-partitioned parquet sink (the per-(chr,region) bucket layout).
    *
    * Rows are REPARTITIONED on the partition keys before the write: a
    * raw partitionBy write emits one file per (task × partition value it
    * holds) — at cluster scale that is tasks×values small files, the
    * classic partitioned-write explosion. Co-locating each value first
    * bounds it at one file per value per holding task (≈ one file per
    * value; AQE coalesces the shuffle), which is also what makes the
    * partition-pruned re-read scan few, large files.
    */
  def writePartitioned(df: DataFrame, partitionCols: Seq[String],
                       path: String): Unit =
    // REBALANCE, not a strict repartition: same one-file-per-value
    // layout for normal values, but AQE may still SPLIT a skewed value
    // across tasks (a strict repartition pins each value to one task —
    // the 80%-in-one-source value would write serially)
    df.hint("rebalance", partitionCols: _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Single combined output file (the gathered VCF shape). NOTE:
    * `coalesce(1)` after `orderBy` collapses the whole post-shuffle sort
    * into ONE task (coalesce is a narrow dependency) — a single output
    * file is inherently a single-task gather. Use it for driver-sized
    * results only; for large sorted output prefer `orderBy(...).write`
    * (sorted part files, distributed) or `writePartitioned`.
    */
  def writeSingleSorted(df: DataFrame, sortCols: Seq[String], path: String,
                        format: String = "parquet"): Unit =
    df.orderBy(sortCols.map(col): _*).coalesce(1)
      .write.mode("overwrite").format(format).save(path)

  /** Bucketed table sink: pre-shuffles rows into `numBuckets` by key so
    * subsequent equi-joins and aggregations on that key are EXCHANGE-FREE
    * — the at-rest co-location the reference gets from per-(chr,region)
    * files, done properly: bucket metadata lives in the catalog, and
    * Catalyst drops the shuffle on both sides of a bucketed join. At
    * 100 TB, bucketing the fact tables on their join key once turns every
    * downstream join into a local zip of bucket files.
    */
  def writeBucketed(df: DataFrame, bucketCols: Seq[String], numBuckets: Int,
                    table: String): Unit = {
    val spark = df.sparkSession
    // idempotence across SESSIONS, not just within one: a fresh session's
    // catalog doesn't know the table, but the managed location on disk
    // survives — saveAsTable would refuse it (LOCATION_ALREADY_EXISTS).
    // Drop both the catalog entry and any orphaned location. `table` is
    // an unqualified name in the current database by contract.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Small-file COMPACTION: rewrite a fragmented directory into
    * ceil(bytes / targetFileBytes) files — the data-plane maintenance
    * pass every long-lived ingestion layout needs (streaming sinks and
    * per-key partitioned writes fragment; scans then pay per-file open
    * + listing cost). One round-robin shuffle sized to the data, no
    * driver involvement beyond a filesystem size probe; returns the
    * target file count. At 100 TB this runs per-partition-directory
    * (compact the partitions that fragmented), not corpus-wide.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              format: String = "parquet",
              targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0)
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .toInt
    spark.read.format(format).load(inPath)
      .repartition(n)
      .write.mode("overwrite").format(format).save(outPath)
    n
  }

  /** JSONL (newline-delimited JSON) sink — the interchange format
    * training-data exports actually ship in. `shards > 0` fixes the
    * output file count with one round-robin repartition (the rebalance
    * trade as writePartitioned: shard count decoupled from task count);
    * 0 writes one file per input partition, no shuffle. Schema rides in
    * the reader (JSONL is schemaless on disk) — see [[readJsonl]].
    */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").format("json").save(path)
  }

  /** XML export on Spark 4's NATIVE xml source (no external connector)
    * — the interchange format enterprise document dumps still arrive
    * in. Same sharding contract as [[writeJsonl]]: `shards > 0` fixes
    * the output file count with one round-robin repartition; 0 writes
    * one file per input partition, no shuffle — never a single writer
    * by construction (a `coalesce(1)` XML export serializes the whole
    * table through one task).
    */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row",
               shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").option("rowTag", rowTag)
      .format("xml").save(path)
  }

  /** Schema-enforced JSONL reader: PERMISSIVE like [[readLenientCsv]] —
    * a malformed line lands in `_corrupt_record` instead of failing the
    * import (count; don't die mid-petabyte).
    */
  def readJsonl(spark: SparkSession, schema: StructType, path: String)
      : DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Delimited-text sink — the reference's actual output shape (its
    * VCF/SAM sinks are tab-separated text: SparkGA1.scala:1242-1251).
    * Headerless by contract to pair with [[readLenientCsv]], which
    * carries the schema on the reader side.
    */
  def writeDelimited(df: DataFrame, path: String,
                     delimiter: String = "\t"): Unit =
    df.write.mode("overwrite")
      .option("delimiter", delimiter)
      .option("header", "false")
      .csv(path)

  /** Lenient delimited-text reader: malformed rows land in
    * `_corrupt_record` instead of failing the job (count them; don't die
    * mid-petabyte). Mirrors the reference's badLines counters.
    */
  def readLenientCsv(spark: SparkSession, schema: StructType, path: String,
                     delimiter: String = "\t"): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("delimiter", delimiter)
      .csv(path)

  /** Write with OBSERVED metrics: the row count and a per-column sum
    * ride the write pass itself via the Observation API — no second
    * scan, no separate count() job re-reading what was just written.
    * This is the Spark-native form of the reference's output manifests
    * (`program/src/main/scala/hmushtaq/sparkga1/SparkGA1.scala:
    * 1110-1114` — every Part-1 task reported its region's row count in
    * `bwaOut.txt`): a production sink should always know how many rows
    * it shipped, and at 100 TB "count it again" costs a full re-scan.
    * Returns (rows written, sum of `sumCol` or 0 when None).
    */
  def writeCounted(df: DataFrame, path: String,
                   format: String = "parquet",
                   sumCol: Option[String] = None): (Long, Long) = {
    val obs = new org.apache.spark.sql.Observation()
    val metrics = count(lit(1)).as("n_rows") +:
      sumCol.map(c => coalesce(sum(col(c)), lit(0L)).cast("long")
        .as("sum_v")).toSeq
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode("overwrite").format(format).save(path)
    val row = obs.get
    (row("n_rows").asInstanceOf[Long],
     if (sumCol.isDefined) row("sum_v").asInstanceOf[Long] else 0L)
  }

  /** Good rows + bad-row count in one pass-shape: returns (clean rows,
    * corrupt rows) as two DataFrames sharing one materialized scan.
    *
    * RESOURCE NOTE: the shared scan is pinned (eager local checkpoint),
    * not cached — a cache entry would sit in the session CacheManager
    * until someone called clearCache(), whereas the pin's blocks are
    * freed by the ContextCleaner once both returned frames are dropped.
    * The pin also satisfies Spark's _corrupt_record restriction (raw
    * text sources refuse filters that reference only the corrupt-record
    * column; a materialized intermediate is the documented workaround,
    * same as the cache was).
    */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val pinned = graft.operators.Components.pin(df, reliable = false)
    (pinned.where(col("_corrupt_record").isNull).drop("_corrupt_record"),
     pinned.where(col("_corrupt_record").isNotNull))
  }

  /** Per-row binary file export: one file `<nameCol>` per row under
    * `dir`, written FROM THE EXECUTORS (`foreachPartition` — no driver
    * collect; each task writes its partition's blobs straight to the
    * store). Inverse of [[readBlobFiles]]; together they are the
    * multimodal blob interchange — opaque payloads travel as files,
    * metadata as columns (Multimodal's schema contract). Names must be
    * unique per row (caller's contract) or last-writer-wins.
    */
  def writeBlobFiles(df: DataFrame, nameCol: String, payloadCol: String,
                     dir: String): Unit = {
    val d = new java.io.File(dir)
    if (d.exists()) d.listFiles().foreach(_.delete()) // overwrite mode
    d.mkdirs()
    df.select(col(nameCol).cast("string"), col(payloadCol).cast("binary"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, r.getString(0)),
            r.getAs[Array[Byte]](1))
        }
      }
  }

  /** Whole-file binary ingest (`binaryFile` source): one row per file
    * with (path, modificationTime, length, content). The scan carries
    * length/path WITHOUT reading content unless `content` is selected
    * (column pruning applies to the blob) — list-then-prune is what
    * makes a 100 TB media crawl scannable for its metadata.
    *
    * GOTCHA: ZERO-BYTE files yield no row — Spark's file-split planning
    * drops empty files before the format sees them. A pipeline that
    * must round-trip empty payloads should write a terminator byte
    * (e.g. newline) so no blob is ever 0 bytes.
    */
  def readBlobFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Schema-evolution read: parquet batches written at different corpus
    * versions (columns added over time) union into ONE frame with the
    * merged schema; rows from pre-addition batches carry NULLs. This is
    * the "the crawl added a `lang` column in May" read path — without
    * `mergeSchema` Spark serves the first footer's schema and silently
    * drops the new column.
    */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
