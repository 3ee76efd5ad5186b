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
