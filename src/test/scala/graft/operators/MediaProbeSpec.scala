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

  test("real decode: exact pixel values from a known PNG fixture") {
    // 3x2 image, hand-set pixels: decode must read them back exactly.
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Seq((0, 0, 0xff0000), (1, 0, 0x00ff00), (2, 0, 0x0000ff),
      (0, 1, 0x102030), (1, 1, 0x405060), (2, 1, 0x708090))
    px.foreach { case (x, y, rgb) => img.setRGB(x, y, rgb) }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val m = Multimodal.decodeImage(out.toByteArray).get
    assert(m.media_type == "image/png" && m.width == 3 && m.height == 2)
    assert(m.n_pixels == 6L)
    // exact channel sums of the six hand-set pixels
    val expR = px.map(p => (p._3 >> 16) & 0xff).sum / 6.0
    val expG = px.map(p => (p._3 >> 8) & 0xff).sum / 6.0
    val expB = px.map(p => p._3 & 0xff).sum / 6.0
    assert(m.avg_r == expR && m.avg_g == expG && m.avg_b == expB,
      s"decoded means (${m.avg_r}, ${m.avg_g}, ${m.avg_b})")
    // non-image bytes decode to None, never throw
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("real decode: JPEG round-trip preserves dims; lossy color is close") {
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(0x336699)); g.fillRect(0, 0, 5, 4) }
    finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val m = Multimodal.decodeImage(out.toByteArray).get
    assert(m.media_type == "image/jpeg" && m.width == 5 && m.height == 4)
    assert(math.abs(m.avg_r - 0x33) < 8 && math.abs(m.avg_g - 0x66) < 8 &&
      math.abs(m.avg_b - 0x99) < 8,
      s"JPEG means drifted: (${m.avg_r}, ${m.avg_g}, ${m.avg_b})")
  }

  test("real resize: nearest-neighbor resample keeps solid fills exact") {
    val bytes = Multimodal.syntheticPng(42L) // 11x3, fill (42, 38, 34)
    val m0 = Multimodal.decodeImage(bytes).get
    assert((m0.width, m0.height) == (11, 3))
    val resized = Multimodal.resizeImage(bytes, 7, 9).get
    val m1 = Multimodal.decodeImage(resized).get
    assert((m1.width, m1.height, m1.n_pixels) == (7, 9, 63L))
    assert(m1.avg_r == (42 % 256).toDouble &&
      m1.avg_g == ((42 * 7) % 256).toDouble &&
      m1.avg_b == ((42 * 13) % 256).toDouble, m1.toString)
    // deterministic: same input, same bytes
    assert(java.util.Arrays.equals(resized,
      Multimodal.resizeImage(bytes, 7, 9).get))
    assert(Multimodal.resizeImage("junk".getBytes, 4, 4).isEmpty)
  }

  test("real WAV decode: sample stats match the synthetic arithmetic") {
    val id = 42L
    val bytes = Multimodal.syntheticWav(id)
    // the fixture is a genuine WAV container (header probe agrees)
    assert(Multimodal.probeMedia(bytes).media_type == "audio/wav")
    val m = Multimodal.decodeWav(bytes).get
    val n = (id % 200 + 50).toInt
    val samples = (0 until n).map(i => ((id * 31 + i * 17) % 2001 - 1000).toInt)
    assert(m.media_type == "audio/wav")
    assert(m.sample_rate == 8000 && m.channels == 1)
    assert(m.n_samples == n.toLong)
    assert(m.sum_sq == samples.map(v => v.toLong * v).sum)
    assert(m.peak == samples.map(math.abs).max)
    // RMS derives exactly from the integer core the oracle replays
    val rms = math.sqrt(m.sum_sq.toDouble / m.n_samples)
    val expected = math.sqrt(samples.map(v => v.toDouble * v).sum / n)
    assert(math.abs(rms - expected) < 1e-9, s"rms $rms != $expected")
  }

  test("WAV decode: garbage, null and non-audio inputs return None") {
    assert(Multimodal.decodeWav("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.syntheticPng(3L)).isEmpty)
    // truncated WAV header must not throw
    assert(Multimodal.decodeWav(
      Multimodal.syntheticWav(7L).take(20).toArray).isEmpty)
  }

  test("real multi-frame decode: sampled frames match the GIF arithmetic") {
    val id = 42L
    val bytes = Multimodal.syntheticGif(id)
    assert(Multimodal.probeMedia(bytes).media_type == "image/gif")
    val n = (id % 12 + 2).toInt          // 8 frames
    val (w, h) = ((id % 5 + 2).toInt, (id % 3 + 2).toInt)
    val frames = Multimodal.decodeFrames(bytes, stride = 2, maxFrames = 4)
    assert(frames.map(_.frame_idx) == (0 until n by 2).take(4))
    frames.foreach { f =>
      assert(f.n_frames == n && f.width == w && f.height == h, f.toString)
      val g = ((id * 11 + f.frame_idx * 37) % 256).toDouble
      assert(f.avg_r == g && f.avg_g == g && f.avg_b == g, f.toString)
    }
    // stride larger than the frame count still yields frame 0
    assert(Multimodal.decodeFrames(bytes, stride = 100, maxFrames = 4)
      .map(_.frame_idx) == Seq(0))
    // a 2-frame fixture (id % 12 == 0) samples only frame 0 at stride 2...
    assert(Multimodal.decodeFrames(Multimodal.syntheticGif(12L), 2, 4)
      .map(_.frame_idx) == Seq(0))
    // ...and both frames at stride 1
    assert(Multimodal.decodeFrames(Multimodal.syntheticGif(12L), 1, 4)
      .map(_.frame_idx) == Seq(0, 1))
  }

  test("multi-frame decode: garbage, null and degenerate args are empty") {
    assert(Multimodal.decodeFrames("not a gif".getBytes, 2, 4).isEmpty)
    assert(Multimodal.decodeFrames(null, 2, 4).isEmpty)
    assert(Multimodal.decodeFrames(Multimodal.syntheticPng(3L), 2, 4).isEmpty)
    assert(Multimodal.decodeFrames(Multimodal.syntheticGif(5L), 0, 4).isEmpty)
    assert(Multimodal.decodeFrames(Multimodal.syntheticGif(5L), 2, 0).isEmpty)
    // truncated container must not throw
    assert(Multimodal.decodeFrames(
      Multimodal.syntheticGif(7L).take(10).toArray, 2, 4).isEmpty)
  }

  test("withSampledFrames explodes real frames, drops undecodables, no shuffle") {
    val df = Seq((1L, Multimodal.syntheticGif(1L)), (2L, "junk".getBytes))
      .toDF("doc_id", "payload")
    val out = Multimodal.withSampledFrames(df, stride = 2, maxFrames = 4)
      .select(col("doc_id"), col("frame.frame_idx"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.forall(_._1 == 1L) && out.map(_._2).sorted.sameElements(
      (0 until (1 % 12 + 2) by 2).take(4)))
    val plan = Multimodal.withSampledFrames(df, 2, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
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

  test("dHash64: brightness-invariant, structure-sensitive, byte-distinct inputs") {
    // same structure p, different exposure b: ids 5, 69 (= 5 + 64), 133
    val base = Multimodal.syntheticGradientPng(5L)
    val brighter = Multimodal.syntheticGradientPng(69L)
    val brightest = Multimodal.syntheticGradientPng(133L)
    assert(!java.util.Arrays.equals(base, brighter),
      "payload bytes must differ across exposures")
    val h = Seq(base, brighter, brightest).map(Multimodal.dHash64(_).get)
    assert(h.distinct.size == 1, s"exposure shift must not change dHash: $h")
    // a different structure key must (here) produce a different hash
    val other = Multimodal.dHash64(Multimodal.syntheticGradientPng(6L)).get
    assert(other != h.head)
    // closed-form replay of the bit definition for one image
    val p = 5; val b = 0
    def lum(x9: Int, y: Int): Long = {
      val sx = x9 * 16 / 9; val sy = y
      299L * ((11 * sx + 23 * sy + 5 * p) % 250 + b) +
        587L * ((7 * sx + 31 * sy + 3 * p) % 250 + b) +
        114L * ((17 * sx + 13 * sy + 11 * p) % 250 + b)
    }
    var expect = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (lum(x + 1, y) > lum(x, y)) expect |= 1L << (y * 8 + x)
    assert(h.head == expect, f"decoded ${h.head}%016x vs closed-form $expect%016x")
  }

  test("dHash64: undecodable and null payloads yield None") {
    assert(Multimodal.dHash64("junk".getBytes).isEmpty)
    assert(Multimodal.dHash64(null).isEmpty)
  }

  test("wavFingerprint: exact arithmetic replay, clone-stable, edge-safe") {
    // replay the synthetic arithmetic independently for one id
    val id = 7L
    val n = (id % 200 + 50).toInt
    val xs = Array.tabulate(n)(i =>
      (math.floorMod(id * 31 + i.toLong * 17, 2001) - 1000).toInt)
    val frames = 25
    val energy = new Array[Long](frames)
    xs.zipWithIndex.foreach { case (x, i) =>
      energy(((i.toLong * frames) / n).toInt) += x.toLong * x }
    var expectFp = 0L
    (0 until frames - 1).foreach { f =>
      if (energy(f) > energy(f + 1)) expectFp |= (1L << f) }
    val got = Multimodal.wavFingerprint(Multimodal.syntheticWav(id), frames)
    assert(got.contains((n.toLong, expectFp)))
    // identical bytes => identical fingerprint (the dedup invariant)
    assert(Multimodal.wavFingerprint(Multimodal.syntheticWav(id), frames)
      == got)
    // non-decodable and too-short payloads are None, never a throw
    assert(Multimodal.wavFingerprint(Array[Byte](1, 2, 3), frames).isEmpty)
    assert(Multimodal.wavFingerprint(null, frames).isEmpty)
    assert(Multimodal.wavFingerprint(Multimodal.syntheticWav(id), 64).isEmpty)
  }
}
