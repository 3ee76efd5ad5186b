package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata alongside.
  * The container has no media libraries, so the *decode* step is a clearly
  * marked deterministic stub; the Spark-side plumbing — schema, batch
  * iteration, partitioning, metadata extraction — is real and tested, and
  * a real decoder drops in by replacing [[decodeStub]] only.
  */
object Multimodal {

  /** Metadata schema carried next to every binary payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("checksum", StringType, nullable = false)))

  /** Wrap a string column as the opaque binary payload (stand-in for real
    * image/audio bytes in fixtures).
    */
  def asBinary(c: Column): Column = to_binary(c, lit("utf-8"))

  /** STUB DECODER — deterministic fake in place of a real image decode
    * (no imaging libs in this container). Derives plausible metadata
    * purely from the bytes so tests are reproducible. A production build
    * replaces this body with the real decoder; everything downstream
    * (schema, partitioning, batching) is unchanged.
    */
  def decodeStub(payload: Column): Column = {
    val n = octet_length(payload).cast("long")
    struct(
      n.as("n_bytes"),
      when(pmod(n, lit(3)) === 0, "image").when(pmod(n, lit(3)) === 1, "audio")
        .otherwise("video").as("media_type"),
      (pmod(n, lit(640)) + 1).cast("int").as("width"),
      (pmod(n, lit(480)) + 1).cast("int").as("height"),
      md5(payload).as("checksum"))
  }

  /** Attach decoded metadata columns to a frame with a binary `payload`
    * column. One narrow projection — no shuffle; at 100 TB this is the
    * per-file map stage.
    */
  def withMediaMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("media_meta", decodeStub(col(payloadCol)))

  /** Probe result: sniffed container type + dimensions where the header
    * carries them (images; audio containers yield type only).
    */
  case class MediaProbe(media_type: String,
      width: Option[Int], height: Option[Int])

  /** REAL header probe — no stub: magic-byte container sniffing and
    * dimension extraction for PNG (IHDR), JPEG (SOF marker walk), GIF,
    * BMP, WAV and MP3, in pure JVM byte inspection. This is the cheap
    * metadata pass a pipeline runs over every payload to filter by
    * type/size/aspect *before* any expensive pixel decode (which remains
    * [[decodeStub]] — that step genuinely needs imaging libs). Malformed
    * or truncated payloads classify as application/octet-stream rather
    * than throwing, so a corrupt file can't fail the scan.
    */
  def probeMedia(bytes: Array[Byte]): MediaProbe = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(i: Int, s: String): Boolean =
      i + s.length <= bytes.length && s.indices.forall(k => u8(i + k) == s(k).toInt)
    val unknown = MediaProbe("application/octet-stream", None, None)
    if (bytes == null) unknown
    else if (bytes.length >= 24 && u8(0) == 0x89 && ascii(1, "PNG"))
      MediaProbe("image/png", Some(be32(16)), Some(be32(20)))
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // SOF walk: segments are (0xFF, marker, len16, payload); the frame
      // header SOF0..SOF15 (minus DHT/JPG/DAC 0xc4/0xc8/0xcc) carries
      // height at +5, width at +7.
      var i = 2
      var out = MediaProbe("image/jpeg", None, None)
      var done = false
      while (!done && i + 9 < bytes.length) {
        if (u8(i) != 0xff) i += 1
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1
          else if ((m >= 0xd0 && m <= 0xd9) || m == 0x01) i += 2
          else {
            val len = be16(i + 2)
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              out = MediaProbe("image/jpeg", Some(be16(i + 7)), Some(be16(i + 5)))
              done = true
            } else if (len < 2) done = true
            else i += 2 + len
          }
        }
      }
      out
    }
    else if (bytes.length >= 10 && (ascii(0, "GIF87a") || ascii(0, "GIF89a")))
      MediaProbe("image/gif", Some(le16(6)), Some(le16(8)))
    else if (bytes.length >= 26 && ascii(0, "BM"))
      MediaProbe("image/bmp", Some(le32(18)), Some(le32(22)))
    else if (bytes.length >= 12 && ascii(0, "RIFF") && ascii(8, "WAVE"))
      MediaProbe("audio/wav", None, None)
    else if (bytes.length >= 3 &&
        (ascii(0, "ID3") || (u8(0) == 0xff && (u8(1) & 0xe0) == 0xe0)))
      MediaProbe("audio/mpeg", None, None)
    else unknown
  }

  private val probeUdf = udf((b: Array[Byte]) => probeMedia(b))

  /** Attach the real header-probe struct (`probe.media_type/width/height`)
    * — same narrow no-shuffle map shape as [[withMediaMeta]].
    */
  def withProbedMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("probe", probeUdf(col(payloadCol)))

  /** STUB RESIZE — the image-resize stage's plumbing: takes the payload
    * plus target dims, returns a new payload + updated metadata struct.
    * The byte transform is a deterministic stand-in (truncate/repeat to a
    * size proportional to the target area — no imaging libs in this
    * container); a real implementation swaps only the byte expression.
    * Shape-wise this is a narrow projection: no shuffle, scales as a map
    * stage over any corpus.
    */
  def resizeStub(payload: Column, width: Int, height: Int): Column = {
    val targetLen = greatest(lit(1L),
      floor(octet_length(payload).cast("long") * (width.toLong * height) /
        (640L * 480L)).cast("long"))
    struct(
      // ??? real pixel resample goes here; stand-in keeps a prefix of the
      // bytes sized by the area ratio so downstream stages see realistic
      // payload-size changes:
      substr(payload, lit(1), targetLen).as("payload"),
      lit(width).as("width"), lit(height).as("height"),
      targetLen.as("n_bytes"))
  }

  /** Attach a resized payload + metadata (the batch resize stage). */
  def withResized(df: DataFrame, width: Int, height: Int,
      payloadCol: String = "payload"): DataFrame =
    df.withColumn("resized", resizeStub(col(payloadCol), width, height))

  /** Frame sampling plumbing: pick every `stride`-th frame index below
    * `maxFrames` — the real pipeline replaces index generation with actual
    * frame extraction; the explode/partition shape is what matters.
    */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: Column, stride: Int,
      maxFrames: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0),
        least(nFramesCol - 1, lit(maxFrames.toLong * stride)), lit(stride))))

  /** Batched feature extraction via mapPartitions — the Scala analogue of
    * `mapInPandas`: the decoder sees an iterator over a whole partition so
    * a real implementation can batch GPU/library calls. The stub emits
    * (id, n_bytes, feature) with a deterministic fake feature.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", LongType), StructField("n_bytes", LongType),
      StructField("feature", DoubleType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .mapPartitions { rows =>
        // batch boundary: a real decoder would load its model once here
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          // ??? real feature extraction goes here; deterministic stand-in:
          Row(r.getLong(0), bytes.length.toLong,
            bytes.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)).toDouble / 1e9)
        }
      }(encoder)
  }
}
