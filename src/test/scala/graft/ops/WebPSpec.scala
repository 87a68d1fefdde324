package graft.ops

import graft.SparkSpec

/** Generated-fixture tests for the WebP container parser: RIFF + VP8 /
  * VP8L / VP8X chunks assembled byte-by-byte from the public layouts.
  */
object WebPFixture {
  def u24le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
  def u32le(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def riff(chunks: Array[Byte]*): Array[Byte] = {
    val body = "WEBP".getBytes("ISO-8859-1") ++ chunks.flatten
    "RIFF".getBytes("ISO-8859-1") ++ u32le(body.length.toLong) ++ body
  }
  def chunk(tag: String, payload: Array[Byte]): Array[Byte] =
    tag.getBytes("ISO-8859-1") ++ u32le(payload.length.toLong) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  /** Lossy key-frame payload: frame tag (key bit 0), sync, 14-bit dims. */
  def vp8(w: Int, h: Int): Array[Byte] =
    chunk("VP8 ", Array[Byte](0x50, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte) ++ new Array[Byte](10))

  /** Lossless payload: 0x2F then w-1 | (h-1)<<14 | alpha<<28, LE. */
  def vp8l(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
    val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
      (if (alpha) 1L << 28 else 0L)
    chunk("VP8L", Array(0x2f.toByte) ++ u32le(bits) ++ new Array[Byte](5))
  }

  /** Extended header: flags byte, 3 reserved, 24-bit canvas w-1 / h-1. */
  def vp8x(w: Int, h: Int, alpha: Boolean, anim: Boolean): Array[Byte] = {
    val flags = (if (alpha) 0x10 else 0) | (if (anim) 0x02 else 0)
    chunk("VP8X", Array(flags.toByte) ++ new Array[Byte](3) ++
      u24le(w - 1) ++ u24le(h - 1))
  }
}

class WebPSpec extends SparkSpec {
  import WebPFixture._

  test("VP8 lossy, VP8L lossless, and VP8X extended all parse dims and flags") {
    val lossy = WebP.parse(riff(vp8(320, 240)))
    assert(lossy == WebP.WebPInfo(ok = true, "lossy", 320, 240,
      hasAlpha = false, animated = false))

    val lossless = WebP.parse(riff(vp8l(100, 50, alpha = true)))
    assert(lossless == WebP.WebPInfo(ok = true, "lossless", 100, 50,
      hasAlpha = true, animated = false))

    val extended = WebP.parse(riff(vp8x(1024, 768, alpha = false, anim = true)))
    assert(extended == WebP.WebPInfo(ok = true, "extended", 1024, 768,
      hasAlpha = false, animated = true))

    // unknown odd-sized chunks are skipped with RIFF padding intact
    val padded = WebP.parse(riff(
      chunk("JUNK", Array[Byte](1, 2, 3)), vp8l(7, 9, alpha = false)))
    assert(padded.ok && padded.width == 7 && padded.height == 9)
  }

  test("non-WebP bytes, truncation, and broken signatures refuse") {
    assert(!WebP.parse("RIFF1234WAVE".getBytes).ok) // RIFF but not WebP
    assert(!WebP.parse(Array[Byte](0x89.toByte, 'P', 'N', 'G')).ok)
    assert(!WebP.parse(Array.empty[Byte]).ok)
    assert(!WebP.parse(riff(vp8(320, 240)).take(25)).ok)
    // VP8 chunk with a broken sync code
    val bad = riff(vp8(320, 240))
    bad(23) = 0x77 // clobber the 0x9d sync byte
    assert(!WebP.parse(bad).ok)
  }

  test("features runs distributed over a binary column") {
    import spark.implicits._
    val df = Seq(
      (1L, riff(vp8l(64, 32, alpha = false))),
      (2L, Array.fill[Byte](32)(7))).toDF("id", "data")
    val rows = WebP.features(df, "id", "data").orderBy("id").collect()
    assert(rows(0).getBoolean(1) && rows(0).getString(2) == "lossless" &&
      rows(0).getInt(3) == 64 && rows(0).getInt(4) == 32)
    assert(!rows(1).getBoolean(1))
  }
}
