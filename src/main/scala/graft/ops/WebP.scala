package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WebP container parsing — format, not codec (the RIFF layout and the
  * VP8 / VP8L / VP8X chunk headers are public specs). Dimensions, alpha,
  * and animation flags come from the container without decoding pixels,
  * so image triage (filter by size, route animations, pick the decode
  * path) runs over binary columns the JDK cannot decode. Pixel work stays
  * behind the honest codec stub ([[Multimodal.stubDecodeFeatures]]).
  */
object WebP {

  final case class WebPInfo(
      ok: Boolean,
      format: String, // "lossy" (VP8), "lossless" (VP8L), "extended" (VP8X)
      width: Int,
      height: Int,
      hasAlpha: Boolean,
      animated: Boolean)

  private val NotWebP = WebPInfo(ok = false, "", 0, 0, hasAlpha = false, animated = false)

  private def u16le(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def u24le(b: Array[Byte], p: Int): Int =
    u16le(b, p) | ((b(p + 2) & 0xff) << 16)
  private def u32le(b: Array[Byte], p: Int): Long =
    u24le(b, p).toLong | ((b(p + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], p: Int): String = new String(b, p, 4, "ISO-8859-1")

  def parse(bytes: Array[Byte]): WebPInfo =
    try parseUnsafe(bytes)
    catch { case _: Exception => NotWebP }

  /** RIFF chunk walk over a WebP container: `(tag, payloadOffset, size)`
    * per chunk, hostile-input-safe — the 32-bit size is read UNSIGNED into
    * a Long (a signed read lets 0xFFFFFFF8 advance the cursor by zero and
    * spin forever — round-10 review), offsets advance monotonically, and
    * truncated chunks terminate the walk. Shared by [[parse]] and
    * [[Vp8l.decodeWebP]], the two container consumers.
    */
  private[ops] def riffChunks(b: Array[Byte]): Iterator[(String, Int, Int)] = {
    if (b.length < 20 || tag(b, 0) != "RIFF" || tag(b, 8) != "WEBP")
      return Iterator.empty
    val riffEnd = math.min(b.length.toLong, 8L + u32le(b, 4))
    new Iterator[(String, Int, Int)] {
      private var p = 12L
      def hasNext: Boolean = p + 8 <= riffEnd
      def next(): (String, Int, Int) = {
        val size = u32le(b, p.toInt + 4) // unsigned 32-bit in a Long
        val payload = p + 8
        val out = (tag(b, p.toInt),
          payload.toInt,
          math.max(0L, math.min(size, riffEnd - payload)).toInt)
        p = payload + size + (size & 1) // Long arithmetic: always advances >= 8
        out
      }
    }
  }

  private def parseUnsafe(b: Array[Byte]): WebPInfo = {
    val it = riffChunks(b)
    if (!it.hasNext) return NotWebP
    while (it.hasNext) {
      val (chunk, payload, size) = it.next()
      chunk match {
        case "VP8 " if size >= 10 =>
          // key-frame header: 3-byte frame tag, sync 9D 01 2A, then
          // 14-bit width/height (low bits; high 2 bits are scaling)
          if ((b(payload) & 0x01) != 0) return NotWebP // not a key frame
          if ((b(payload + 3) & 0xff) != 0x9d || (b(payload + 4) & 0xff) != 0x01 ||
            (b(payload + 5) & 0xff) != 0x2a) return NotWebP
          val w = u16le(b, payload + 6) & 0x3fff
          val h = u16le(b, payload + 8) & 0x3fff
          return WebPInfo(ok = true, "lossy", w, h, hasAlpha = false, animated = false)
        case "VP8L" if size >= 5 =>
          // signature 0x2F, then 14-bit width-1, 14-bit height-1, alpha bit
          if ((b(payload) & 0xff) != 0x2f) return NotWebP
          val bits = u32le(b, payload + 1)
          val w = (bits & 0x3fff).toInt + 1
          val h = ((bits >> 14) & 0x3fff).toInt + 1
          val alpha = ((bits >> 28) & 1) == 1
          return WebPInfo(ok = true, "lossless", w, h, alpha, animated = false)
        case "VP8X" if size >= 10 =>
          // flags byte: ...ALEXA... (bit 4 alpha, bit 1 animation),
          // then 24-bit canvas width-1 / height-1
          val flags = b(payload) & 0xff
          val w = u24le(b, payload + 4) + 1
          val h = u24le(b, payload + 7) + 1
          return WebPInfo(ok = true, "extended", w, h,
            hasAlpha = (flags & 0x10) != 0, animated = (flags & 0x02) != 0)
        case _ => // skip unknown chunks (padded to even size per RIFF)
      }
    }
    NotWebP
  }

  /** Spark-side triage over a binary column: container metadata per row,
    * `mapPartitions`, payloads never on the driver.
    */
  def features(df: DataFrame, idCol: String, dataCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(dataCol)).as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        val i = parse(bytes)
        (id, i.ok, i.format, i.width, i.height, i.hasAlpha, i.animated)
      })
      .toDF(idCol, "ok", "format", "width", "height", "has_alpha", "animated")
  }
}
