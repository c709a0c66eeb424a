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
  * The decoder is a real pure-JVM header parser: BMP and WAV (and PNG's
  * IHDR) are plain byte arithmetic — no codec library needed — so
  * `decodeMedia` reads genuine width/height/sample-rate/channels from
  * genuine file bytes. Compressed payload DATA (JPEG entropy coding,
  * audio codecs) would still need a library; those formats fall through
  * to `format = "raw"` with size/checksum only.
  */
object Multimodal {

  /** Metadata schema carried next to every payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mime", StringType, nullable = false)))

  /** Feature schema produced by the decoder. `format` is "bmp" / "wav" /
    * "png" / "raw"; fields a format doesn't carry are -1 (never NULL —
    * keeps downstream aggregation null-safe).
    */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                           format: String, width: Int, height: Int,
                           sample_rate: Int, channels: Int)

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

  // little/big-endian field reads — the whole of header "decoding"
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  /** Real header decode, pure byte arithmetic (no codec library):
    *  - BMP (BITMAPFILEHEADER + BITMAPINFOHEADER): width/height at
    *    offsets 18/22, 32-bit little-endian.
    *  - WAV (RIFF/WAVE, "fmt " chunk first): channels at 22 (LE16),
    *    sample rate at 24 (LE32).
    *  - PNG IHDR: width/height at 16/20, 32-bit big-endian.
    * Anything else — including truncated headers — is `"raw"` with
    * size + checksum only (-1 dims), never a throw: one corrupt blob
    * must not kill a 100 TB extraction job.
    */
  def decodeMedia(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    val n = bytes.length
    if (n >= 26 && ascii(bytes, 0, "BM"))
      MediaFeatures(id, n, sum, "bmp",
        width = le32(bytes, 18), height = le32(bytes, 22),
        sample_rate = -1, channels = -1)
    else if (n >= 36 && ascii(bytes, 0, "RIFF") &&
             ascii(bytes, 8, "WAVE") && ascii(bytes, 12, "fmt "))
      MediaFeatures(id, n, sum, "wav", width = -1, height = -1,
        sample_rate = le32(bytes, 24), channels = le16(bytes, 22))
    else if (n >= 24 && bytes(0) == 0x89.toByte && ascii(bytes, 1, "PNG"))
      MediaFeatures(id, n, sum, "png",
        width = be32(bytes, 16), height = be32(bytes, 20),
        sample_rate = -1, channels = -1)
    else
      MediaFeatures(id, n, sum, "raw", -1, -1, -1, -1)
  }

  /** Minimal valid 24-bpp BMP (BITMAPINFOHEADER, rows padded to 4 bytes,
    * deterministic pixel fill) — the fixture side of the decode
    * round-trip. File size = 54 + height · rowSize,
    * rowSize = ⌈3·width/4⌉·4.
    */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = (width * 3 + 3) / 4 * 4
    val size = 54 + rowSize * height
    val b = new Array[Byte](size)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = { w16(o, v & 0xffff); w16(o + 2, v >>> 16) }
    b(0) = 'B'; b(1) = 'M'
    w32(2, size); w32(10, 54)
    w32(14, 40); w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24)
    w32(34, rowSize * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width * 3) { b(54 + y * rowSize + x) = ((x + y) % 256).toByte; x += 1 }
      y += 1
    }
    b
  }

  /** Minimal valid PCM-16 WAV (RIFF/WAVE + "fmt " + "data", deterministic
    * samples) — file size = 44 + nSamples · channels · 2.
    */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0)
    val dataSize = nSamples * channels * 2
    val b = new Array[Byte](44 + dataSize)
    def w16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = { w16(o, v & 0xffff); w16(o + 2, v >>> 16) }
    def tag(o: Int, s: String): Unit = s.indices.foreach(i => b(o + i) = s.charAt(i).toByte)
    tag(0, "RIFF"); w32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, channels)
    w32(24, sampleRate); w32(28, sampleRate * channels * 2)
    w16(32, channels * 2); w16(34, 16)
    tag(36, "data"); w32(40, dataSize)
    var i = 0
    while (i < nSamples * channels) { w16(44 + i * 2, (i * 31) & 0xffff); i += 1 }
    b
  }

  /** Batched feature extraction over (id, payload) rows: one decoder
    * invocation per row, streamed per partition (the mapInPandas /
    * Arrow-batch execution shape, minus Python).
    */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeMedia(id, bytes) })
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
