package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The REAL multimodal header probe: hand-built valid PNG/JPEG/GIF/BMP/
  * WAV/MP3 byte payloads must sniff to the right container with the right
  * dimensions; garbage and truncated payloads must classify as
  * octet-stream without throwing.
  */
class MediaProbeSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(2 + 4 + 16 + 4 + 9)
    b.put(Array(0xff, 0xd8).map(_.toByte))                   // SOI
    b.put(Array(0xff, 0xe0).map(_.toByte)).putShort(18)      // APP0, len 18
    b.put(new Array[Byte](16))                               // APP0 payload
    b.put(Array(0xff, 0xc0).map(_.toByte)).putShort(11)      // SOF0, len 11
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort)  // prec, H, W
    b.put(3.toByte).put(new Array[Byte](3))
    b.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ Array((w & 0xff).toByte, (w >> 8).toByte,
      (h & 0xff).toByte, (h >> 8).toByte) ++ new Array[Byte](6)

  private def wav: Array[Byte] =
    "RIFF".getBytes ++ Array.fill(4)(0.toByte) ++ "WAVEfmt ".getBytes

  test("containers sniff with correct dimensions") {
    assert(Multimodal.probeMedia(png(640, 480)) ==
      Multimodal.MediaProbe("image/png", Some(640), Some(480)))
    assert(Multimodal.probeMedia(jpeg(1024, 768)) ==
      Multimodal.MediaProbe("image/jpeg", Some(1024), Some(768)))
    assert(Multimodal.probeMedia(gif(320, 200)) ==
      Multimodal.MediaProbe("image/gif", Some(320), Some(200)))
    assert(Multimodal.probeMedia(wav) ==
      Multimodal.MediaProbe("audio/wav", None, None))
    assert(Multimodal.probeMedia("ID3x".getBytes).media_type == "audio/mpeg")
  }

  test("garbage and truncation classify, never throw") {
    assert(Multimodal.probeMedia("not an image at all".getBytes).media_type
      == "application/octet-stream")
    assert(Multimodal.probeMedia(Array[Byte]()).media_type
      == "application/octet-stream")
    // PNG signature but truncated before IHDR dims
    assert(Multimodal.probeMedia(png(9, 9).take(12)).media_type
      == "application/octet-stream")
    // JPEG SOI but no SOF anywhere
    assert(Multimodal.probeMedia(Array(0xff, 0xd8, 0x00, 0x01).map(_.toByte))
      == Multimodal.MediaProbe("image/jpeg", None, None))
  }

  test("withProbedMeta is a narrow projection over the frame") {
    val df = Seq((1L, png(64, 32)), (2L, "junk".getBytes), (3L, gif(8, 8)))
      .toDF("id", "payload")
    val out = Multimodal.withProbedMeta(df)
      .select(col("id"), col("probe.media_type"), col("probe.width"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "image/png", 2L -> "application/octet-stream",
      3L -> "image/gif"))
    val plan = Multimodal.withProbedMeta(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
