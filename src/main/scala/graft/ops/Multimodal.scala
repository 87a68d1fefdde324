package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata.
  *
  * Decode is REAL for every codec the JDK itself ships: PNG / JPEG / BMP /
  * GIF via `javax.imageio` ([[decodeImageFeatures]], [[resizeImages]]) and
  * PCM WAV via `javax.sound.sampled` ([[decodeAudioFeatures]]) — per-row
  * work inside `mapPartitions`, payloads never on the driver. Video
  * CONTAINERS are real too: [[Mp4]] walks the ISO BMFF box structure
  * (public spec, format-not-codec) to extract metadata and keyframe byte
  * ranges without decoding. Lossless WebP (VP8L) pixels decode for real
  * through the pure-JVM [[Vp8l]] bitstream decoder (round 10). Only
  * pixel/sample CODECS still missing
  * (h264 frames, lossy webp, mp3, …) go through [[stubDecodeFeatures]], the
  * clearly-marked seam where a JNI/ONNX executor codec or
  * `mapInPandas`+PIL would slot in; the schema and batch shape are
  * identical on both paths.
  *
  * Scale notes: payloads never move to the driver; chunking/sampling are
  * byte-slice expressions (codegen); decode runs inside `mapPartitions`,
  * amortizing codec/registry init per partition — the standard shape
  * for 100 TB media tables. Feature math samples a bounded pixel grid, so
  * per-row cost is independent of image size once decoded.
  */
object Multimodal {

  /** Decoded-image features: `ok = false` rows carry zeros (undecodable
    * bytes never kill a 100 TB job — they get filtered by `ok`).
    */
  final case class ImageFeatures(
      id: Long, ok: Boolean, width: Int, height: Int, mean_luma: Double)

  /** Real image decode + feature extraction: JDK `javax.imageio` (PNG,
    * JPEG, BMP, GIF) plus the pure-JVM [[Vp8l]] decoder for lossless
    * WebP (round 10 — webp pixels left the codec stub). Mean luminance
    * (ITU-R BT.601) is sampled on a ≤ 64×64 grid, so cost per row is
    * bounded regardless of resolution.
    */
  def decodeImageFeatures(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) ImageFeatures(id, ok = false, 0, 0, 0.0)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val (sum, cnt) = sampledLumaSum(w, h, (x, y) => img.getRGB(x, y))
            ImageFeatures(id, ok = true, w, h, sum / cnt)
          }
        }
      }.toDF(idCol, "ok", "width", "height", "mean_luma")
  }

  /** Decode any supported image to a BufferedImage: JDK ImageIO formats,
    * then the pure-JVM [[Vp8l]] path for lossless WebP. Null when neither
    * can decode (callers emit `ok = false`).
    */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val viaJdk =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (viaJdk != null) viaJdk
    else Vp8l.decodeWebP(bytes) match {
      case Some(d) =>
        val img = new java.awt.image.BufferedImage(
          d.width, d.height, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        img.setRGB(0, 0, d.width, d.height, d.argb, 0, d.width)
        img
      case None => null
    }
  }

  /** BT.601 luma summed over the bounded ≤ 64×64 sample grid. */
  private def sampledLumaSum(w: Int, h: Int, rgbAt: (Int, Int) => Int): (Double, Long) = {
    val sx = math.max(1, w / 64)
    val sy = math.max(1, h / 64)
    var sum = 0.0
    var cnt = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = rgbAt(x, y)
        sum += 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        cnt += 1
        x += sx
      }
      y += sy
    }
    (sum, cnt)
  }

  /** Real thumbnail resize (longest side → `maxDim`, aspect preserved),
    * re-encoded as PNG. Undecodable rows pass through with `ok = false`
    * and empty bytes.
    */
  def resizeImages(df: DataFrame, idCol: String, dataCol: String, maxDim: Int): DataFrame = {
    require(maxDim >= 1, "maxDim must be >= 1")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) (id, false, Array.empty[Byte], 0, 0)
          else {
            val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
            val tw = math.max(1, math.round(img.getWidth * scale).toInt)
            val th = math.max(1, math.round(img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw, th, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            (id, true, bos.toByteArray, tw, th)
          }
        }
      }.toDF(idCol, "ok", "thumbnail_png", "width", "height")
  }

  /** 64-bit perceptual image hash (aHash: bilinear-reduce to 8×8
    * grayscale, one bit per cell above the mean — Average Hash, the
    * public pHash-family baseline). Near-identical images (recompression,
    * small edits, minor noise) land within a few bits, so
    * [[imageNearDupPairs]] mines visual duplicates through the same
    * pigeonhole machinery as text SimHash. Undecodable rows hash to null.
    * Bit j (MSB-first, row-major cells) = cell luma > mean.
    */
  def perceptualHash(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readImage(bytes)
          if (img == null) (id, None: Option[Long])
          else {
            val small = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = small.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, 8, 8, null)
            g.dispose()
            val luma = new Array[Double](64)
            var i = 0
            while (i < 64) {
              val rgb = small.getRGB(i % 8, i / 8)
              luma(i) = 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              i += 1
            }
            val mean = luma.sum / 64
            var h = 0L
            i = 0
            while (i < 64) {
              if (luma(i) > mean) h |= 1L << (63 - i)
              i += 1
            }
            (id, Some(h))
          }
        }
      }.toDF(idCol, "phash")
  }

  /** Visual near-dup pairs: perceptual hash + the signature-agnostic
    * pigeonhole Hamming join ([[Dedup.hamming64Pairs]]) — never all-pairs,
    * hot buckets capped, undecodable rows excluded by their null hash.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, dataCol: String,
      maxDistance: Int = 5, maxBucketSize: Option[Int] = Some(10000)): DataFrame =
    Dedup.hamming64Pairs(perceptualHash(df, idCol, dataCol),
      idCol, "phash", maxDistance, maxBucketSize)

  /** 64-bin envelope hash over an abstract sample accessor — shared by the
    * javax-PCM and FLAC decode paths so both formats hash identically for
    * identical audio.
    */
  private def envelope64(nSamples: Int, sample: Int => Double): Option[Long] = {
    if (nSamples < 64) return None
    val rms = new Array[Double](64)
    var b = 0
    while (b < 64) {
      val from = (b.toLong * nSamples / 64).toInt
      val until = ((b + 1).toLong * nSamples / 64).toInt
      var sum = 0.0
      var i = from
      while (i < until) {
        val s = sample(i)
        sum += s * s
        i += 1
      }
      rms(b) = math.sqrt(sum / math.max(1, until - from))
      b += 1
    }
    val mean = rms.sum / 64
    var h = 0L
    b = 0
    while (b < 64) {
      if (rms(b) > mean) h |= 1L << (63 - b)
      b += 1
    }
    Some(h)
  }

  private def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length > 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  /** 64-bit audio fingerprint — the envelope analogue of [[perceptualHash]]:
    * decode 16-bit PCM (javax WAV/AIFF/AU, or [[Flac]] for fLaC payloads),
    * split the sample stream into 64 equal-time bins, one bit per bin with
    * RMS above the mean bin RMS. Robust to small noise/level changes (the
    * mean threshold is self-normalizing), so re-encoded or
    * slightly-degraded copies land within a few bits and
    * [[audioNearDupPairs]] mines them through [[Dedup.hamming64Pairs]].
    * Undecodable or non-16-bit payloads hash to null.
    */
  def audioFingerprint(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            if (isFlac(bytes)) {
              // real PCM via the pure-JVM decoder — javax.sound has no FLAC
              val audio = Flac.decode(bytes)
              if (audio.info.bitsPerSample != 16) (id, None: Option[Long])
              else {
                val ch = audio.samples
                val n = ch(0).length * ch.length
                // interleaved order matches the WAV path's sample stream
                (id, envelope64(n,
                  i => ch(i % ch.length)(i / ch.length) / 32768.0))
              }
            } else {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val fmt = in.getFormat
              if (fmt.getSampleSizeInBits != 16) (id, None: Option[Long])
              else {
                val data = in.readAllBytes()
                val bb = java.nio.ByteBuffer.wrap(data).order(
                  if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                  else java.nio.ByteOrder.LITTLE_ENDIAN)
                (id, envelope64(data.length / 2, i => bb.getShort(i * 2) / 32768.0))
              }
            }
          } catch { case _: Exception => (id, None: Option[Long]) }
        }
      }.toDF(idCol, "afp")
  }

  /** Audible near-dup pairs: envelope fingerprint + the signature-agnostic
    * pigeonhole Hamming join — same bounded plan as text/image near-dup.
    */
  def audioNearDupPairs(df: DataFrame, idCol: String, dataCol: String,
      maxDistance: Int = 5, maxBucketSize: Option[Int] = Some(10000)): DataFrame =
    Dedup.hamming64Pairs(audioFingerprint(df, idCol, dataCol),
      idCol, "afp", maxDistance, maxBucketSize)

  /** Decoded-audio features (JDK `javax.sound.sampled`: PCM WAV/AIFF/AU;
    * FLAC via the pure-JVM [[Flac]] decoder since r13).
    * RMS amplitude is computed over 16-bit samples, normalized to [0, 1].
    */
  final case class AudioFeatures(
      id: Long, ok: Boolean, sample_rate: Double, channels: Int,
      n_frames: Long, duration_ms: Long, rms: Double)

  def decodeAudioFeatures(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            if (isFlac(bytes)) {
              val audio = Flac.decode(bytes)
              val si = audio.info
              val frames = audio.samples(0).length.toLong
              val durMs = (frames * 1000.0 / si.sampleRate).toLong
              var rms = 0.0
              if (si.bitsPerSample == 16 && frames > 0) {
                var sum = 0.0
                var c = 0
                while (c < audio.samples.length) {
                  val ch = audio.samples(c)
                  var i = 0
                  while (i < ch.length) {
                    val s = ch(i) / 32768.0
                    sum += s * s
                    i += 1
                  }
                  c += 1
                }
                rms = math.sqrt(sum / (frames * audio.samples.length))
              }
              AudioFeatures(id, ok = true, si.sampleRate.toDouble, si.channels,
                frames, durMs, rms)
            } else {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = in.getFormat
            val frames = in.getFrameLength
            val durMs = (frames * 1000.0 / fmt.getSampleRate).toLong
            // RMS over 16-bit samples; non-16-bit PCM reports rms = 0
            var rms = 0.0
            if (fmt.getSampleSizeInBits == 16) {
              val data = in.readAllBytes()
              val bb = java.nio.ByteBuffer.wrap(data).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              var sum = 0.0
              val nSamples = data.length / 2
              var i = 0
              while (i < nSamples) {
                val s = bb.getShort(i * 2) / 32768.0
                sum += s * s
                i += 1
              }
              if (nSamples > 0) rms = math.sqrt(sum / nSamples)
            }
            AudioFeatures(id, ok = true, fmt.getSampleRate.toDouble,
              fmt.getChannels, frames, durMs, rms)
            }
          } catch {
            case _: Exception => AudioFeatures(id, ok = false, 0.0, 0, 0L, 0L, 0.0)
          }
        }
      }.toDF(idCol, "ok", "sample_rate", "channels", "n_frames", "duration_ms", "rms")
  }

  /** Typed metadata carried next to every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a binary column + format into the canonical payload struct. */
  def asset(data: Column, format: Column, width: Column, height: Column, durationMs: Column): Column =
    struct(
      data.as("data"),
      struct(format.as("format"), width.cast("int").as("width"),
        height.cast("int").as("height"), durationMs.cast("long").as("duration_ms")).as("meta"))

  /** Fixed-size byte frames sampled every `stride` bytes — the binary
    * analogue of video frame-sampling; pure expression (substr on binary).
    */
  def frameSample(data: Column, frameSize: Int, stride: Int): Column = {
    // integer floor-division so the frame count is exact (`/` alone is fp;
    // subtracting the remainder first makes the division exact)
    val span = greatest(length(data) - frameSize, lit(0))
    val lastIdx = ((span - pmod(span, lit(stride))) / stride).cast("int")
    transform(
      sequence(lit(0), lastIdx),
      i => substring(data, (i * stride + 1).cast("int"), lit(frameSize)))
  }

  def frameCount(data: Column, frameSize: Int, stride: Int): Column =
    size(frameSample(data, frameSize, stride))

  /** STUB decoder — strictly for PIXEL/PCM work of CODECS the JDK does
    * not ship (h264/vp9 frame pixels, LOSSY webp pixels, mp3 PCM —
    * lossless WebP is real since round 10, see [[Vp8l]]; FLAC PCM is real
    * since round 13, see [[Flac]]) —
    * deterministic fake features: byte length, a content hash, and a
    * pseudo-"brightness" (mean of a sampled byte prefix). The schema and
    * distribution contract match the real [[decodeImageFeatures]] path;
    * swap in a JNI/ONNX executor codec here and nothing else moves. The
    * FORMAT layer around those codecs is real: [[Mp4.keyframeRanges]]
    * (ISO BMFF), [[Mp3.frameRanges]] (MPEG audio frame walk — duration,
    * bitrate, channels, frame byte ranges), and [[WebP.features]]
    * (RIFF/VP8/VP8L/VP8X — dimensions, alpha, animation) run distributed
    * over the raw binary columns, so this stub only ever sees the
    * kilobyte frame ranges they select, not whole files.
    */
  def stubDecodeFeatures(data: Column): Column = {
    val prefix = substring(data, 1, 64)
    val bytes = transform(sequence(lit(1), least(length(prefix), lit(64))),
      i => ascii(substring(base64(substring(prefix, i.cast("int"), lit(1))), 1, 1)))
    struct(
      length(data).as("n_bytes"),
      md5(data).as("content_hash"),
      round(aggregate(bytes, lit(0L), (acc, b) => acc + b).cast("double") /
        greatest(least(length(prefix), lit(64)), lit(1)), 4).as("brightness_stub"))
  }

  /** "Resize" stub: re-chunk the payload to a target byte budget by uniform
    * sampling — keeps the plumbing (new payload struct, updated metadata)
    * honest while the pixel math is stubbed.
    */
  def resizeStub(payload: Column, targetBytes: Int): Column = {
    val data = payload.getField("data")
    val meta = payload.getField("meta")
    val sampled = substring(data, 1, targetBytes)
    struct(sampled.as("data"),
      struct(meta.getField("format").as("format"),
        (meta.getField("width") / 2).cast("int").as("width"),
        (meta.getField("height") / 2).cast("int").as("height"),
        meta.getField("duration_ms").as("duration_ms")).as("meta"))
  }

  /** End-to-end demo pipeline over a text table: fabricate binary payloads
    * (deterministic: utf8 bytes), then run the real plumbing — frame
    * sampling, stub feature extraction — entirely as expressions.
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = asset(
      encode(col(textCol), "UTF-8"), lit("text/utf-8"),
      lit(0), lit(0), lit(0L))
    docs.select(col(idCol).as("doc_id"), payload.as("asset"))
      .select(
        col("doc_id"),
        col("asset.meta.format").as("format"),
        length(col("asset.data")).as("n_bytes"),
        frameCount(col("asset.data"), 256, 128).as("n_frames"),
        stubDecodeFeatures(col("asset.data")).as("features"))
  }
}
