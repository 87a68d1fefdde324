package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Generated-fixture tests for the ISO BMFF container parser: a minimal but
  * spec-valid MP4 (ftyp + mdat + moov with full sample tables) with known
  * sample layout, so every parsed field and keyframe byte range has one
  * right answer.
  */
object Mp4Fixture {
  def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  def u32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    u32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  /** 4 samples (sizes 10/20/30/40) in 2 chunks of 2; keyframes 1 and 3;
    * 320×240, timescale 1000, duration 5000 ⇒ 5000 ms. Returns
    * (fileBytes, chunk1Offset, chunk2Offset).
    */
  def build(brand: String = "isom", withStss: Boolean = true): (Array[Byte], Long, Long) = {
    val ftyp = box("ftyp", brand.getBytes, u32(0), "mp41".getBytes)
    val mdatPayload = Array.tabulate(100)(_.toByte)
    val mdat = box("mdat", mdatPayload)
    val c1 = ftyp.length + 8L // first chunk: samples 1-2 (sizes 10, 20)
    val c2 = c1 + 30L // second chunk: samples 3-4 (sizes 30, 40)

    val mvhd = box("mvhd", u32(0), u32(0), u32(0), u32(1000), u32(5000),
      new Array[Byte](80)) // rate..next_track_id: zeros, parser ignores
    val tkhd = box("tkhd", u32(0), u32(0), u32(0), u32(1), u32(0), u32(0),
      new Array[Byte](52), // reserved/layer/group/volume/matrix
      u32(320L << 16), u32(240L << 16))
    val hdlr = box("hdlr", u32(0), u32(0), "vide".getBytes, new Array[Byte](12))
    val stss =
      if (withStss) Seq(box("stss", u32(0), u32(2), u32(1), u32(3))) else Seq.empty
    val stbl = box("stbl",
      (Seq(
        box("stts", u32(0), u32(1), u32(4), u32(1)),
        box("stsc", u32(0), u32(1), u32(1), u32(2), u32(1)),
        box("stsz", u32(0), u32(0), u32(4), u32(10), u32(20), u32(30), u32(40)),
        box("stco", u32(0), u32(2), u32(c1), u32(c2))) ++ stss): _*)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    (ftyp ++ mdat ++ moov, c1, c2)
  }
}

class Mp4Spec extends AnyFunSuite {
  import Mp4Fixture._

  test("parse: brand, duration, dimensions, sample count, keyframe ranges") {
    val (bytes, c1, c2) = build()
    val info = Mp4.parse(bytes)
    assert(info.ok && info.brand == "isom")
    assert(info.durationMs == 5000L)
    assert(info.width == 320 && info.height == 240)
    assert(info.nSamples == 4)
    // keyframe 1 = first sample of chunk 1; keyframe 3 = first of chunk 2
    assert(info.keyframes == Seq(Mp4.Keyframe(1, c1, 10L), Mp4.Keyframe(3, c2, 30L)))
  }

  test("parse: missing stss means every sample is a sync sample (spec default)") {
    val (bytes, c1, c2) = build(withStss = false)
    val info = Mp4.parse(bytes)
    assert(info.ok && info.keyframes.map(_.sample) == Seq(1, 2, 3, 4))
    // intra-chunk offsets accumulate the preceding samples' sizes
    assert(info.keyframes.map(_.offset) == Seq(c1, c1 + 10L, c2, c2 + 30L))
  }

  test("parse: garbage, truncation and non-MP4 bytes are ok=false, never throw") {
    assert(!Mp4.parse(Array.empty[Byte]).ok)
    assert(!Mp4.parse("not a movie at all".getBytes).ok)
    val (bytes, _, _) = build()
    for (cut <- Seq(3, 10, bytes.length / 2)) {
      val t = Mp4.parse(bytes.take(cut))
      assert(!t.ok || t.keyframes.isEmpty, s"cut=$cut")
    }
    // hostile size fields must not loop or throw
    val evil = u32(0xffffffffL) ++ "moov".getBytes ++ new Array[Byte](8)
    assert(!Mp4.parse(evil).ok)
  }
}

class Mp4SparkSpec extends SparkSpec {
  import Mp4Fixture._

  test("keyframeRanges: distributed parse + byte slicing, bad rows survive") {
    import spark.implicits._
    val (bytes, c1, c2) = build()
    val df = Seq((1L, bytes), (2L, "junk".getBytes)).toDF("vid_id", "payload")
    val rows = Mp4.keyframeRanges(df, "vid_id", "payload", maxFrames = 8)
      .orderBy("vid_id").collect()

    val good = rows(0)
    assert(good.getBoolean(1) && good.getString(2) == "isom")
    assert(good.getLong(3) == 5000L && good.getInt(4) == 320 && good.getInt(5) == 240)
    assert(good.getInt(7) == 2) // n_keyframes
    val frames = good.getSeq[org.apache.spark.sql.Row](8)
    assert(frames.map(_.getInt(0)) == Seq(1, 3))
    // sliced bytes are exactly the planted sample ranges
    assert(frames(0).getAs[Array[Byte]]("data").toSeq ==
      bytes.slice(c1.toInt, c1.toInt + 10).toSeq)
    assert(frames(1).getAs[Array[Byte]]("data").toSeq ==
      bytes.slice(c2.toInt, c2.toInt + 30).toSeq)

    val bad = rows(1)
    assert(!bad.getBoolean(1) && bad.getSeq[Any](8).isEmpty)
  }
}
