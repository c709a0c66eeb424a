package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; feature extraction runs
  * batched per partition.
  *
  * Scale design: the payload column stays opaque to Catalyst (no codegen
  * over megabyte blobs); metadata lives in a small sibling struct so
  * filters/pruning touch only metadata (Parquet reads skip the blob
  * column entirely when it isn't selected). Extraction is a
  * `mapPartitions` over row batches — the same batch shape as an Arrow/
  * Pandas-UDF pipeline, so a real decoder drops in without changing the
  * plan. Heavy per-row work parallelizes by partition count, not driver
  * loops.
  *
  * NOTE on the decoder: this container has no image/audio codecs, so
  * `decodeStub` is a clearly-marked deterministic fake (derives "pixel"
  * stats from the raw bytes). The Spark-side plumbing — schema, batching,
  * partitioning, column pruning — is real and tested; swap `decodeStub`
  * for a JNI/library decoder in production.
  */
object Multimodal {

  /** Metadata schema carried next to every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = false)))

  /** Feature schema produced by the (stub) decoder. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                           width: Int, height: Int)

  /** Wrap a text column as an opaque binary payload + metadata struct —
    * the ingestion shape for any media column.
    */
  def attachPayload(df: DataFrame, idCol: String, contentCol: String,
                    mime: String = "text/plain"): DataFrame =
    df.select(
      col(idCol),
      encode(col(contentCol), "UTF-8").as("payload"),
      struct(octet_length(encode(col(contentCol), "UTF-8")).as("n_bytes"),
             lit(mime).as("mime")).as("meta"))

  /** Pure-expression payload features (no decode): size, content hash,
    * prefix sample. These run codegen'd inside the scan stage.
    */
  def payloadFeatures(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("payload")).as("content_md5"),
      hex(substring(col("payload"), 1, 8)).as("prefix_hex"))

  /** ---- STUB DECODER ----
    * Deterministic fake "decode": derives width/height/checksum from the
    * raw bytes. Replace with a real codec; the signature (bytes in,
    * features out) and the batched execution path stay identical.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    MediaFeatures(id, bytes.length, sum,
      width = (sum % 640).toInt + 1, height = (sum % 480).toInt + 1)
  }

  /** Batched feature extraction over (id, payload) rows: one decoder
    * invocation per row, streamed per partition (the mapInPandas /
    * Arrow-batch execution shape, minus Python).
    */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Frame sampling for a (fake) multi-frame payload: emit every
    * `stride`-th fixed-size block as a "frame" — the plumbing for video
    * frame extraction (one input row → N frame rows, a generator shape).
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = bytes.length / frameBytes
        (0 until n by stride).map { f =>
          (id, f, bytes.slice(f * frameBytes, (f + 1) * frameBytes))
        }
      }.toDF(idCol, "frame_no", "frame")
  }
}
