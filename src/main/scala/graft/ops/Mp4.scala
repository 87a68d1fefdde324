package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MP4 / ISO BMFF container parsing — format, not codec: the box structure
  * (ISO/IEC 14496-12, a public spec) locates keyframes as byte ranges
  * without decoding a single pixel, which is exactly what a training-data
  * pipeline needs to SAMPLE frames from 100 TB of video before handing the
  * (tiny) selected ranges to an actual decoder. This shrinks the honest
  * codec stub ([[Multimodal.stubDecodeFeatures]]) to pixel work only; the
  * container walk is real.
  *
  * Parsed per payload: major brand (`ftyp`), movie duration (`mvhd`), the
  * first video track's dimensions (`tkhd`) and sample tables (`stbl`):
  * sync samples (`stss`; absent ⇒ every sample is sync, per spec), sample
  * sizes (`stsz`), sample→chunk mapping (`stsc`) and chunk offsets
  * (`stco`/`co64`), combined into file-absolute (offset, size) ranges per
  * keyframe. Truncated or non-MP4 bytes yield `ok = false` — malformed
  * payloads never kill a job (the [[Multimodal]] contract).
  */
object Mp4 {

  final case class Keyframe(sample: Int, offset: Long, size: Long)

  final case class Mp4Info(
      ok: Boolean,
      brand: String,
      durationMs: Long,
      width: Int,
      height: Int,
      nSamples: Int,
      keyframes: Seq[Keyframe])

  private val NotMp4 = Mp4Info(ok = false, "", 0L, 0, 0, 0, Nil)

  /** One box: (type, payloadStart, payloadEnd) over `b`, or null past end. */
  private final class Walker(b: Array[Byte], var pos: Long, val end: Long) {
    def u8(p: Long): Int = b(p.toInt) & 0xff
    def u16(p: Long): Int = (u8(p) << 8) | u8(p + 1)
    def u32(p: Long): Long = (u16(p).toLong << 16) | u16(p + 2)
    def u64(p: Long): Long = (u32(p) << 32) | u32(p + 4)
    def tag(p: Long): String = new String(b, p.toInt, 4, "ISO-8859-1")

    /** Next box header at `pos`; advances `pos` past the box. */
    def next(): (String, Long, Long) = {
      if (pos + 8 > end) return null
      var size = u32(pos)
      val typ = tag(pos + 4)
      var payload = pos + 8
      if (size == 1L) { // 64-bit largesize
        if (pos + 16 > end) return null
        size = u64(pos + 8); payload = pos + 16
      } else if (size == 0L) size = end - pos // box extends to end
      if (size < payload - pos || pos + size > end) return null
      val r = (typ, payload, pos + size)
      pos += size
      r
    }
  }

  def parse(bytes: Array[Byte]): Mp4Info =
    try parseUnsafe(bytes)
    catch { case _: Exception => NotMp4 } // truncated/hostile bytes: not-MP4

  private def parseUnsafe(bytes: Array[Byte]): Mp4Info = {
    val top = new Walker(bytes, 0L, bytes.length.toLong)
    var brand = ""
    var moov: (Long, Long) = null
    var box = top.next()
    while (box != null) {
      box match {
        case ("ftyp", s, _) => brand = top.tag(s)
        case ("moov", s, e) => moov = (s, e)
        case _ => ()
      }
      box = top.next()
    }
    if (brand.isEmpty || moov == null) return NotMp4

    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var keyframes: Seq[Keyframe] = Nil
    var nSamples = 0
    var haveVideo = false

    val mw = new Walker(bytes, moov._1, moov._2)
    var mbox = mw.next()
    while (mbox != null) {
      mbox match {
        case ("mvhd", s, _) =>
          val v = mw.u8(s)
          if (v == 1) { timescale = mw.u32(s + 20); duration = mw.u64(s + 24) }
          else { timescale = mw.u32(s + 12); duration = mw.u32(s + 16) }
        case ("trak", s, e) if !haveVideo =>
          parseTrak(bytes, s, e) match {
            case Some((w, h, n, kfs)) =>
              haveVideo = true; width = w; height = h; nSamples = n; keyframes = kfs
            case None => ()
          }
        case _ => ()
      }
      mbox = mw.next()
    }
    val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
    Mp4Info(ok = true, brand, durMs, width, height, nSamples, keyframes)
  }

  /** The first VIDEO track's (width, height, sampleCount, keyframes). */
  private def parseTrak(
      bytes: Array[Byte], start: Long, end: Long): Option[(Int, Int, Int, Seq[Keyframe])] = {
    var width = 0
    var height = 0
    var isVideo = false
    var stbl: (Long, Long) = null

    def walk(s: Long, e: Long): Unit = {
      val w = new Walker(bytes, s, e)
      var box = w.next()
      while (box != null) {
        box match {
          case ("tkhd", p, _) =>
            val v = w.u8(p)
            val dimOff = p + (if (v == 1) 88L else 76L) // fixed header + matrix
            width = (w.u32(dimOff) >> 16).toInt // 16.16 fixed point
            height = (w.u32(dimOff + 4) >> 16).toInt
          case ("hdlr", p, _) =>
            if (w.tag(p + 8) == "vide") isVideo = true
          case ("stbl", p, e2) => stbl = (p, e2)
          case ("mdia", p, e2) => walk(p, e2)
          case ("minf", p, e2) => walk(p, e2)
          case _ => ()
        }
        box = w.next()
      }
    }
    walk(start, end)
    if (!isVideo || stbl == null) return None

    var sizes: Array[Long] = null // per-sample sizes
    var syncs: Array[Int] = null // 1-based keyframe sample numbers; null = all
    var stsc: Array[(Long, Long)] = null // (firstChunk, samplesPerChunk)
    var chunkOffsets: Array[Long] = null

    val w = new Walker(bytes, stbl._1, stbl._2)
    var box = w.next()
    while (box != null) {
      box match {
        case ("stsz", p, _) =>
          val fixed = w.u32(p + 4)
          val n = w.u32(p + 8).toInt
          sizes =
            if (fixed != 0L) Array.fill(n)(fixed)
            else Array.tabulate(n)(i => w.u32(p + 12 + 4L * i))
        case ("stss", p, _) =>
          val n = w.u32(p + 4).toInt
          syncs = Array.tabulate(n)(i => w.u32(p + 8 + 4L * i).toInt)
        case ("stsc", p, _) =>
          val n = w.u32(p + 4).toInt
          stsc = Array.tabulate(n)(i =>
            (w.u32(p + 8 + 12L * i), w.u32(p + 12 + 12L * i)))
        case ("stco", p, _) =>
          val n = w.u32(p + 4).toInt
          chunkOffsets = Array.tabulate(n)(i => w.u32(p + 8 + 4L * i))
        case ("co64", p, _) =>
          val n = w.u32(p + 4).toInt
          chunkOffsets = Array.tabulate(n)(i => w.u64(p + 8 + 8L * i))
        case _ => ()
      }
      box = w.next()
    }
    if (sizes == null || stsc == null || chunkOffsets == null) return None

    // sample number (1-based) -> file offset: expand the stsc run-length
    // map chunk by chunk, accumulating intra-chunk offsets from the sizes
    val offsets = new Array[Long](sizes.length)
    var sample = 0
    var run = 0
    var chunk = 1
    while (chunk <= chunkOffsets.length && sample < sizes.length) {
      while (run + 1 < stsc.length && stsc(run + 1)._1 <= chunk) run += 1
      val perChunk = stsc(run)._2.toInt
      var within = 0L
      var i = 0
      while (i < perChunk && sample < sizes.length) {
        offsets(sample) = chunkOffsets(chunk - 1) + within
        within += sizes(sample)
        sample += 1
        i += 1
      }
      chunk += 1
    }
    val syncList = // stss absent ⇒ every sample is a sync sample (spec §8.6.2)
      if (syncs == null) (1 to sizes.length).toArray else syncs
    val kfs = syncList.toIndexedSeq
      .filter(sn => sn >= 1 && sn <= sample)
      .map(sn => Keyframe(sn, offsets(sn - 1), sizes(sn - 1)))
    Some((width, height, sizes.length, kfs))
  }

  /** Spark-side keyframe extraction: parse each payload, uniform-sample up
    * to `maxFrames` keyframes, and slice their bytes out of the SAME
    * payload (offsets are file-absolute, and the file IS the row's binary
    * column). `mapPartitions`, payloads never on the driver; per-row output
    * is bounded by `maxFrames` × keyframe size regardless of video length —
    * the downstream decoder sees kilobytes per row, not the corpus.
    */
  def keyframeRanges(
      df: DataFrame, idCol: String, dataCol: String, maxFrames: Int = 8): DataFrame = {
    require(maxFrames >= 1, "maxFrames must be >= 1")
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val info = parse(bytes)
          val picked =
            if (info.keyframes.length <= maxFrames) info.keyframes
            else { // uniform positions over the keyframe list, first + spread
              val n = info.keyframes.length
              (0 until maxFrames).map(i => info.keyframes(i * (n - 1) / (maxFrames - 1).max(1)))
            }
          val frames = picked.map { k =>
            val from = k.offset.toInt
            val to = math.min(bytes.length.toLong, k.offset + k.size).toInt
            (k.sample, k.offset,
              if (from >= 0 && from <= to) java.util.Arrays.copyOfRange(bytes, from, to)
              else Array.empty[Byte])
          }
          (id, info.ok, info.brand, info.durationMs, info.width, info.height,
            info.nSamples, info.keyframes.length, frames)
        }
      }
      .toDF(idCol, "ok", "brand", "duration_ms", "width", "height",
        "n_samples", "n_keyframes", "frames")
      .withColumn("frames", col("frames").cast(
        "array<struct<sample:int,offset:bigint,data:binary>>"))
  }
}
