package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MPEG audio (MP3) frame-header parsing — format, not codec (ISO/IEC
  * 11172-3 and the MPEG-2/2.5 extensions, public specs). Walking the
  * 4-byte frame headers yields duration, bitrate profile (CBR/VBR),
  * sample rate, channel mode, and every frame's byte range WITHOUT
  * decoding audio — which is what a pipeline needs to filter/sample 100 TB
  * of audio before a real decoder sees the (tiny) selected frames. This
  * shrinks the honest codec stub ([[Multimodal.stubDecodeFeatures]]) to
  * PCM synthesis only; the container walk is real.
  *
  * An ID3v2 tag (syncsafe size) is skipped; frames then chain by computed
  * size. Bytes that never sync, or sync to inconsistent headers, yield
  * `ok = false` — malformed payloads never kill a job (the [[Multimodal]]
  * contract).
  */
object Mp3 {

  final case class Frame(offset: Long, size: Int)

  final case class Mp3Info(
      ok: Boolean,
      version: String, // "1", "2", "2.5"
      layer: Int, // 1..3
      sampleRate: Int,
      channels: Int,
      bitrateKbps: Int, // average across frames, rounded
      vbr: Boolean, // more than one distinct frame bitrate
      durationMs: Long,
      frames: Seq[Frame])

  private val NotMp3 = Mp3Info(ok = false, "", 0, 0, 0, 0, vbr = false, 0L, Nil)

  // bitrate tables in kbps, indexed [version group][layer][index 1..14]
  // (index 0 = free-format, 15 = invalid — both rejected here)
  private val bitratesV1: Array[Array[Int]] = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448), // L1
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384), // L2
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)) // L3
  private val bitratesV2: Array[Array[Int]] = Array(
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256), // L1
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160), // L2
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)) // L3

  private val sampleRates: Map[String, Array[Int]] = Map(
    "1" -> Array(44100, 48000, 32000),
    "2" -> Array(22050, 24000, 16000),
    "2.5" -> Array(11025, 12000, 8000))

  private final case class Header(
      version: String, layer: Int, bitrateKbps: Int, sampleRate: Int,
      padding: Int, channels: Int) {
    def samplesPerFrame: Int = layer match {
      case 1 => 384
      case 2 => 1152
      case 3 => if (version == "1") 1152 else 576
    }
    def frameSize: Int = layer match {
      case 1 => (12 * bitrateKbps * 1000 / sampleRate + padding) * 4
      case _ =>
        val coef = if (layer == 3 && version != "1") 72 else 144
        coef * bitrateKbps * 1000 / sampleRate + padding
    }
  }

  /** Parse the 4-byte header at `off`, or None if not a valid frame sync. */
  private def header(b: Array[Byte], off: Int): Option[Header] = {
    if (off + 4 > b.length) return None
    val h0 = b(off) & 0xff; val h1 = b(off + 1) & 0xff
    val h2 = b(off + 2) & 0xff; val h3 = b(off + 3) & 0xff
    if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
    val version = ((h1 >> 3) & 3) match {
      case 3 => "1"
      case 2 => "2"
      case 0 => "2.5"
      case _ => return None // reserved
    }
    val layer = ((h1 >> 1) & 3) match {
      case 3 => 1
      case 2 => 2
      case 1 => 3
      case _ => return None // reserved
    }
    val brIdx = (h2 >> 4) & 0xf
    if (brIdx == 0 || brIdx == 15) return None // free-format/invalid
    val srIdx = (h2 >> 2) & 3
    if (srIdx == 3) return None // reserved
    val table = if (version == "1") bitratesV1 else bitratesV2
    val channels = if (((h3 >> 6) & 3) == 3) 1 else 2 // mode 3 = mono
    Some(Header(version, layer, table(layer - 1)(brIdx - 1),
      sampleRates(version)(srIdx), (h2 >> 1) & 1, channels))
  }

  def parse(bytes: Array[Byte]): Mp3Info =
    try parseUnsafe(bytes)
    catch { case _: Exception => NotMp3 }

  private def parseUnsafe(bytes: Array[Byte]): Mp3Info = {
    var pos = 0
    // ID3v2: "ID3" ver(2) flags(1) syncsafe-size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + size
    }
    // resync: scan a bounded window for the first valid header that is
    // CONFIRMED by a second valid header right after its computed size
    // (a lone 0xFFE bit pattern inside junk is common)
    var first: Option[Header] = None
    val scanEnd = math.min(bytes.length, pos + 64 * 1024)
    while (first.isEmpty && pos < scanEnd) {
      first = header(bytes, pos).filter { h =>
        val nxt = pos + h.frameSize
        nxt >= bytes.length || header(bytes, nxt).isDefined
      }
      if (first.isEmpty) pos += 1
    }
    val h0 = first.getOrElse(return NotMp3)

    val frames = Seq.newBuilder[Frame]
    var nFrames = 0
    var totalSamplesBySr = 0.0 // frames can switch rates mid-stream (VBR)
    var kbpsSum = 0L
    val kbpsSeen = scala.collection.mutable.Set.empty[Int]
    var cur: Option[Header] = Some(h0)
    while (cur.isDefined) {
      val h = cur.get
      val size = math.min(h.frameSize.toLong, bytes.length.toLong - pos).toInt
      frames += Frame(pos.toLong, size)
      nFrames += 1
      totalSamplesBySr += h.samplesPerFrame.toDouble / h.sampleRate
      kbpsSum += h.bitrateKbps
      kbpsSeen += h.bitrateKbps
      pos += h.frameSize
      cur = if (pos + 4 > bytes.length) None else header(bytes, pos)
    }
    Mp3Info(ok = true, h0.version, h0.layer, h0.sampleRate, h0.channels,
      math.round(kbpsSum.toDouble / nFrames).toInt, kbpsSeen.size > 1,
      math.round(totalSamplesBySr * 1000).toLong, frames.result())
  }

  /** Spark-side frame sampling, the audio twin of [[Mp4.keyframeRanges]]:
    * parse each payload, uniform-sample up to `maxFrames` frames, slice
    * their bytes from the row's own binary column. `mapPartitions`,
    * payloads never on the driver; per-row output is bounded by
    * `maxFrames` × frame size regardless of audio length.
    */
  def frameRanges(
      df: DataFrame, idCol: String, dataCol: String, maxFrames: Int = 8): DataFrame = {
    require(maxFrames >= 1, "maxFrames must be >= 1")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val info = parse(bytes)
          val picked =
            if (info.frames.length <= maxFrames) info.frames
            else {
              val n = info.frames.length
              (0 until maxFrames).map(i => info.frames(i * (n - 1) / (maxFrames - 1).max(1)))
            }
          val frames = picked.map { f =>
            val from = f.offset.toInt
            val to = math.min(bytes.length.toLong, f.offset + f.size).toInt
            (f.offset,
              if (from >= 0 && from <= to) java.util.Arrays.copyOfRange(bytes, from, to)
              else Array.empty[Byte])
          }
          (id, info.ok, info.version, info.layer, info.sampleRate, info.channels,
            info.bitrateKbps, info.vbr, info.durationMs, info.frames.length, frames)
        }
      }
      .toDF(idCol, "ok", "mpeg_version", "layer", "sample_rate", "channels",
        "bitrate_kbps", "vbr", "duration_ms", "n_frames", "frames")
      .withColumn("frames", col("frames").cast(
        "array<struct<offset:bigint,data:binary>>"))
  }
}
