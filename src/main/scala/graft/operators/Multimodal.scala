package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata alongside.
  * All three modalities decode for REAL with base-JDK codecs — pixels via
  * `javax.imageio` (PNG/JPEG/GIF/BMP; decode, statistics, resample),
  * audio samples via `javax.sound.sampled` (WAV PCM), multi-frame
  * containers via the GIF sequence reader ([[decodeFrames]], stride
  * sampling) — no external library needed. The Spark-side plumbing
  * (schema, batch iteration, partitioning, metadata extraction) is a
  * narrow map stage throughout; [[probeMedia]] sniffs containers the JDK
  * cannot decode (MP3 et al.) at the byte level.
  */
object Multimodal {

  // ImageIO's default stream cache backs every read/write with a temp
  // FILE (FileCache*ImageStream) — per-row disk IO plus a global cache-dir
  // lock that serializes 32 decode threads. Payloads here are KB-sized;
  // memory-cached streams are strictly better (measured on q_m5: the GIF
  // write+decode scan dropped ~4x once the temp-file path was off).
  javax.imageio.ImageIO.setUseCache(false)

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

  // ===== real JDK image codec ==========================================

  /** Decoded-image summary: container type (from the header probe),
    * pixel dimensions, and exact per-channel means — enough to filter by
    * size/aspect/brightness and to verify a decode end-to-end.
    */
  case class ImageMeta(media_type: String, width: Int, height: Int,
      n_pixels: Long, avg_r: Double, avg_g: Double, avg_b: Double)

  /** REAL pixel decode via `javax.imageio` (PNG/JPEG/GIF/BMP in the base
    * JDK): returns dimensions and exact per-channel means, or None for
    * bytes no installed reader accepts. Cost is O(pixels) per row — the
    * per-record work of any decode stage; run [[probeMedia]] first to
    * filter by type/size when only the header matters.
    */
  def decodeImage(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(ImageMeta(probeMedia(bytes).media_type, w, h, n,
          sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
      }
    } catch { case _: Exception => None }
  }

  /** REAL resample: decode, draw into a `width`×`height` RGB canvas with
    * deterministic nearest-neighbor interpolation, re-encode as PNG
    * (lossless, so solid regions survive bit-exactly). None for
    * undecodable payloads.
    */
  def resizeImage(bytes: Array[Byte], width: Int,
      height: Int): Option[Array[Byte]] = {
    if (bytes == null || width <= 0 || height <= 0) return None
    try {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (src == null) None
      else {
        val dst = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
          g.drawImage(src, 0, 0, width, height, null)
        } finally g.dispose()
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Some(out.toByteArray)
      }
    } catch { case _: Exception => None }
  }

  /** Deterministic solid-color PNG fixture: dimensions and fill color are
    * pure arithmetic in `id` (width = id%16+1, height = id%8+1, RGB =
    * (id%256, 7id%256, 13id%256)), so an external oracle can predict the
    * decoded dimensions and exact channel means of every fixture without
    * being able to decode PNG itself.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (math.floorMod(id, 16) + 1).toInt
    val h = (math.floorMod(id, 8) + 1).toInt
    val rgb = ((math.floorMod(id, 256) << 16) |
      (math.floorMod(id * 7, 256) << 8) | math.floorMod(id * 13, 256)).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16×8 gradient PNG — the patterned sibling of
    * [[syntheticPng]] for perceptual hashing (a solid fill has no
    * gradient, so its dHash is vacuously zero). Channel values at pixel
    * (x, y) are pure arithmetic in the STRUCTURE key `p = id mod 64` plus
    * a small brightness offset `b = (id div 64) mod 3`:
    * r = (11x + 23y + 5p) mod 250 + b, g = (7x + 31y + 3p) mod 250 + b,
    * blue = (17x + 13y + 11p) mod 250 + b. Ids sharing `p` are therefore
    * the SAME picture at slightly different exposure — byte-distinct
    * files that a perceptual hash must group and an md5 never will. PNG
    * is lossless, so an oracle predicts every decoded pixel exactly.
    */
  def syntheticGradientPng(id: Long): Array[Byte] = {
    val p = math.floorMod(id, 64).toInt
    val b = math.floorMod(id / 64, 3).toInt
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val r = (11 * x + 23 * y + 5 * p) % 250 + b
      val g = (7 * x + 31 * y + 3 * p) % 250 + b
      val bl = (17 * x + 13 * y + 11 * p) % 250 + b
      img.setRGB(x, y, (r << 16) | (g << 8) | bl)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Column form of [[syntheticGradientPng]]. */
  def syntheticGradientPayload(id: Column): Column =
    udf((i: Long) => syntheticGradientPng(i)).apply(id)

  /** 64-bit difference hash (dHash) — the standard cheap perceptual
    * image fingerprint: sample the decoded image to a 9×8 luminance grid
    * and emit one bit per horizontally adjacent pair (`L(x+1,y) >
    * L(x,y)`). Comparing NEIGHBORS makes the hash invariant to uniform
    * brightness shifts — the property the near-dup demo leans on — and
    * resampling makes it invariant to scale. The resample here is
    * explicit integer nearest-neighbor (`sx = X·w div 9`, `sy = Y·h div
    * 8` on the JDK-decoded pixels) rather than Graphics2D, so every bit
    * is integer arithmetic an external oracle can replay; luminance is
    * integer Rec.601 (299r + 587g + 114b, unscaled).
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        def lum(gx: Int, gy: Int): Long = {
          val rgb = img.getRGB(gx * w / 9, gy * h / 8)
          299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
        }
        var hash = 0L
        for (y <- 0 until 8; x <- 0 until 8)
          if (lum(x + 1, y) > lum(x, y))
            hash |= 1L << (y * 8 + x)
        Some(hash)
      }
    } catch { case _: Exception => None }
  }

  /** Column form of [[dHash64]]. */
  def dHashCol(payload: Column): Column =
    udf((b: Array[Byte]) => dHash64(b)).apply(payload)

  /** Decoded-audio facts: container type, format fields, and exact
    * integer sample statistics (sum of squared samples and peak |sample|
    * — the integer core of RMS/peak loudness, kept integer so an
    * external oracle can replay them without any float compare; RMS
    * itself = sqrt(sum_sq / n_samples), pinned in MediaProbeSpec).
    */
  case class AudioMeta(media_type: String, sample_rate: Int, channels: Int,
      n_samples: Long, sum_sq: Long, peak: Int)

  /** REAL sample-level WAV decode via `javax.sound.sampled` (base JDK,
    * zero-egress): parses the RIFF/fmt headers through the JDK's audio
    * system, streams the PCM payload, and computes exact sample
    * statistics. Only 16-bit signed PCM is decoded (the dominant WAV
    * encoding; anything else returns None rather than guessing). Cost is
    * O(samples) per row — the per-record work of any decode stage; run
    * [[probeMedia]] first when only the container type matters.
    */
  def decodeWav(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val be = fmt.isBigEndian
          var i = 0; var n = 0L; var ss = 0L; var peak = 0
          while (i + 1 < data.length) {
            val v =
              if (be) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toInt
            n += 1; ss += v.toLong * v
            val a = math.abs(v); if (a > peak) peak = a
            i += 2
          }
          Some(AudioMeta("audio/wav", fmt.getSampleRate.toInt,
            fmt.getChannels, n, ss, peak))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Deterministic PCM WAV fixture — the audio twin of [[syntheticPng]]:
    * 8 kHz mono 16-bit signed PCM whose length and every sample are pure
    * arithmetic in `id` (n = id%200+50 samples; sample i =
    * (id*31 + i*17) % 2001 − 1000), encoded through the real
    * `javax.sound.sampled` WAV writer — so an external oracle can predict
    * the decoded sample count, sum of squares, and peak of every fixture
    * without being able to parse WAV itself.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (math.floorMod(id, 200) + 50).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (math.floorMod(id * 31 + i.toLong * 17, 2001) - 1000).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Frame-energy audio fingerprint over a REAL WAV decode — the audio
    * sibling of [[dHash64]]: the decoded sample stream is cut into
    * `frames` contiguous frames (sample i → frame `(i·frames) div n`,
    * the exact integer assignment an external engine replays), each
    * frame's energy is its exact Σx² (integer), and the fingerprint
    * packs the `frames−1` consecutive-frame comparisons
    * (energy[f] > energy[f+1] → bit f) into a long — the
    * energy-contour shape, invariant to what a bit-exact copy can't
    * change. Returns (n_samples, fingerprint); None for non-decodable
    * or sub-`frames` payloads.
    */
  def wavFingerprint(bytes: Array[Byte], frames: Int): Option[(Long, Long)] = {
    if (frames < 2 || frames > 63) return None
    decodeWavSamples(bytes).flatMap { samples =>
      val n = samples.length
      if (n < frames) None
      else {
        val energy = new Array[Long](frames)
        var i = 0
        while (i < n) {
          val f = ((i.toLong * frames) / n).toInt
          energy(f) += samples(i).toLong * samples(i)
          i += 1
        }
        var fp = 0L
        var f = 0
        while (f < frames - 1) {
          if (energy(f) > energy(f + 1)) fp |= (1L << f)
          f += 1
        }
        Some((n.toLong, fp))
      }
    }
  }

  /** The decoded 16-bit PCM sample array (endianness-correct), or None —
    * the sample-level core [[decodeWav]] aggregates over.
    */
  private def decodeWavSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val be = fmt.isBigEndian
          val out = new Array[Int](data.length / 2)
          var i = 0; var j = 0
          while (i + 1 < data.length) {
            out(j) =
              if (be) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort.toInt
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toInt
            i += 2; j += 1
          }
          Some(out)
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  private val wavFpUdf = udf((b: Array[Byte], frames: Int) =>
    wavFingerprint(b, frames))

  /** Column form of [[wavFingerprint]]: struct(n_samples, fp) or NULL. */
  def wavFingerprintCol(payload: Column, frames: Int): Column =
    wavFpUdf(payload, lit(frames))

  private val decodeWavUdf = udf((b: Array[Byte]) => decodeWav(b))
  private val synthWavUdf = udf((id: Long) => syntheticWav(id))

  /** Column form of [[syntheticWav]]. */
  def synthWavPayload(idCol: Column): Column = synthWavUdf(idCol)

  /** Attach the real decoded-audio struct (`audio_meta.*`, NULL for
    * non-decodable payloads) — the same narrow no-shuffle map stage as
    * [[withImageMeta]].
    */
  def withAudioMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("audio_meta", decodeWavUdf(col(payloadCol)))

  private val decodeImageUdf = udf((b: Array[Byte]) => decodeImage(b))
  private val synthPngUdf = udf((id: Long) => syntheticPng(id))

  /** Column form of [[syntheticPng]]. */
  def synthPayload(idCol: Column): Column = synthPngUdf(idCol)

  /** Column form of [[resizeImage]] (fixed target dims). */
  def resizedPayload(payload: Column, width: Int, height: Int): Column =
    udf((b: Array[Byte]) => resizeImage(b, width, height)).apply(payload)

  /** Attach the real decoded-image struct (`image_meta.*`, NULL for
    * non-image payloads) — a narrow no-shuffle map stage.
    */
  def withImageMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("image_meta", decodeImageUdf(col(payloadCol)))

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Combined metadata record: byte-level facts for every payload, pixel
    * dimensions where a real decode succeeds, header-probe dimensions
    * otherwise. Matches [[mediaMetaSchema]].
    */
  case class MediaMetaRec(n_bytes: Long, media_type: String,
      width: Option[Int], height: Option[Int], checksum: String)

  private val mediaMetaUdf = udf((b: Array[Byte]) => {
    val bytes = if (b == null) Array.emptyByteArray else b
    decodeImage(bytes) match {
      case Some(m) => MediaMetaRec(bytes.length.toLong, m.media_type,
        Some(m.width), Some(m.height), md5Hex(bytes))
      case None =>
        val p = probeMedia(bytes)
        MediaMetaRec(bytes.length.toLong, p.media_type, p.width, p.height,
          md5Hex(bytes))
    }
  }).asNonNullable()

  /** Attach decoded metadata columns to a frame with a binary `payload`
    * column: REAL pixel dimensions for decodable images, header-probe
    * facts otherwise. One narrow projection — no shuffle; at 100 TB this
    * is the per-file map stage.
    */
  def withMediaMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("media_meta", mediaMetaUdf(col(payloadCol)))

  /** Probe result: sniffed container type + dimensions where the header
    * carries them (images; audio containers yield type only).
    */
  case class MediaProbe(media_type: String,
      width: Option[Int], height: Option[Int])

  /** REAL header probe — no stub: magic-byte container sniffing and
    * dimension extraction for PNG (IHDR), JPEG (SOF marker walk), GIF,
    * BMP, WAV and MP3, in pure JVM byte inspection. This is the cheap
    * metadata pass a pipeline runs over every payload to filter by
    * type/size/aspect *before* the expensive per-pixel/per-sample decode
    * ([[decodeImage]] / [[decodeWav]]). Malformed
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

  /** Resized-image record: the re-encoded PNG payload + its new
    * dimensions and byte count; all fields NULL when the input payload
    * is not a decodable image.
    */
  case class ResizedRec(payload: Array[Byte], width: Int, height: Int,
      n_bytes: Long)

  /** Attach a REAL resized payload + metadata (the batch resize stage):
    * decode, nearest-neighbor resample to `width`×`height`, re-encode as
    * PNG ([[resizeImage]]). `resized` is NULL for non-image payloads.
    * Shape-wise a narrow projection: no shuffle, scales as a map stage
    * over any corpus.
    */
  def withResized(df: DataFrame, width: Int, height: Int,
      payloadCol: String = "payload"): DataFrame = {
    val resizeUdf = udf((b: Array[Byte]) =>
      resizeImage(b, width, height).map(out =>
        ResizedRec(out, width, height, out.length.toLong)))
    df.withColumn("resized", resizeUdf(col(payloadCol)))
  }

  /** Frame sampling plumbing: pick every `stride`-th frame index below
    * `maxFrames` — the real pipeline replaces index generation with actual
    * frame extraction; the explode/partition shape is what matters.
    */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: Column, stride: Int,
      maxFrames: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0),
        least(nFramesCol - 1, lit(maxFrames.toLong * stride)), lit(stride))))

  // ===== real multi-frame (video-shaped) codec =========================

  /** One sampled frame of a multi-frame container: total frame count,
    * this frame's index, dimensions, and exact per-channel means.
    */
  case class FrameMeta(n_frames: Int, frame_idx: Int, width: Int,
      height: Int, avg_r: Double, avg_g: Double, avg_b: Double)

  /** REAL multi-frame decode with stride sampling, via the base JDK's GIF
    * sequence reader — the video analogue of [[decodeImage]]/[[decodeWav]]:
    * animated GIF is the one multi-frame container the JDK can both write
    * and read losslessly, so it stands in for video the way WAV stands in
    * for audio. Counts the stored frames, then decodes ONLY every
    * `stride`-th frame up to `maxFrames` — per-row cost is
    * O(sampled-frame pixels), not O(all frames), which is the property a
    * frame-sampling stage exists for. Empty for undecodable payloads.
    */
  def decodeFrames(bytes: Array[Byte], stride: Int,
      maxFrames: Int): Seq[FrameMeta] = {
    if (bytes == null || stride <= 0 || maxFrames <= 0) return Seq.empty
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return Seq.empty
    val reader = readers.next()
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      (0 until n by stride).take(maxFrames).map { i =>
        val img = reader.read(i)
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val np = w.toLong * h
        FrameMeta(n, i, w, h, sr.toDouble / np, sg.toDouble / np,
          sb.toDouble / np)
      }
    } catch { case _: Exception => Seq.empty }
    finally reader.dispose()
  }

  /** Deterministic multi-frame GIF fixture — the video twin of
    * [[syntheticPng]]/[[syntheticWav]]: `id % 12 + 2` solid-gray frames of
    * `(id%5+2)`×`(id%3+2)` pixels, frame f filled with gray
    * `(id*11 + f*37) % 256`, written through the real JDK GIF sequence
    * writer. GIF is palette-indexed and lossless, so every decoded frame's
    * channel means equal the fill value exactly — an external oracle can
    * predict frame count, sampled indexes, dimensions, and means of every
    * fixture arithmetically without parsing GIF itself.
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val nFrames = (math.floorMod(id, 12) + 2).toInt
    val w = (math.floorMod(id, 5) + 2).toInt
    val h = (math.floorMod(id, 3) + 2).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val g = math.floorMod(id * 11 + f.toLong * 37, 256).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gg = img.createGraphics()
        try { gg.setColor(new java.awt.Color(g, g, g)); gg.fillRect(0, 0, w, h) }
        finally gg.dispose()
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private val synthGifUdf = udf((id: Long) => syntheticGif(id))

  /** Column form of [[syntheticGif]]. */
  def synthGifPayload(idCol: Column): Column = synthGifUdf(idCol)

  /** Explode REAL sampled frames of a multi-frame payload: one output row
    * per decoded frame (`frame.*` per [[FrameMeta]]), rows for payloads no
    * reader accepts are dropped. A narrow map + generator stage — no
    * shuffle, scales as a per-record decode over any corpus, and only the
    * sampled frames are ever decoded.
    */
  def withSampledFrames(df: DataFrame, stride: Int, maxFrames: Int,
      payloadCol: String = "payload"): DataFrame = {
    val framesUdf = udf((b: Array[Byte]) => decodeFrames(b, stride, maxFrames))
    df.withColumn("frame", explode(framesUdf(col(payloadCol))))
  }

  /** Batched feature extraction via mapPartitions — the Scala analogue of
    * `mapInPandas`: the extractor sees an iterator over a whole partition
    * so model/library state loads once per batch. Emits (id, n_bytes,
    * feature): for decodable images the feature is the REAL mean
    * luminance (Rec. 601 weights over decoded pixels, in [0, 1]); for
    * non-image payloads it falls back to a deterministic content hash in
    * [0, 1] so mixed-modality frames still get a usable scalar.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType), StructField("n_bytes", LongType),
      StructField("feature", DoubleType)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("payload"))
      .mapPartitions { rows =>
        // batch boundary: model/library state would initialize once here
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val feature = decodeImage(bytes) match {
            case Some(m) =>
              (0.299 * m.avg_r + 0.587 * m.avg_g + 0.114 * m.avg_b) / 255.0
            case None =>
              (bytes.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)) & 0xfffff)
                .toDouble / 0xfffff.toDouble
          }
          Row(r.getLong(0), bytes.length.toLong, feature)
        }
      }(encoder)
  }
}
