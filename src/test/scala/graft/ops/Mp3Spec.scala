package graft.ops

import graft.SparkSpec

/** Generated-fixture tests for the MPEG audio frame walker: synthetic
  * streams assembled header-by-header from the public tables, so frame
  * counts, sizes, duration, and VBR detection each have one right answer.
  */
object Mp3Fixture {

  /** One frame: MPEG1 Layer III, 44.1 kHz, stereo. Size 144*br/sr (+pad). */
  def frame(bitrateKbps: Int, padding: Int = 0, fill: Byte = 0x55): Array[Byte] = {
    val brIdx = Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
      .indexOf(bitrateKbps) + 1
    require(brIdx > 0, s"not a V1L3 bitrate: $bitrateKbps")
    val size = 144 * bitrateKbps * 1000 / 44100 + padding
    val b = Array.fill[Byte](size)(fill)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte // sync + MPEG1 + Layer III + no CRC
    b(2) = ((brIdx << 4) | (0 << 2) | (padding << 1)).toByte // 44.1 kHz
    b(3) = 0x00 // stereo
    b
  }

  def id3v2(tagBytes: Int): Array[Byte] = {
    val b = new Array[Byte](10 + tagBytes)
    b(0) = 'I'; b(1) = 'D'; b(2) = '3'; b(3) = 4; b(4) = 0; b(5) = 0
    b(6) = ((tagBytes >> 21) & 0x7f).toByte; b(7) = ((tagBytes >> 14) & 0x7f).toByte
    b(8) = ((tagBytes >> 7) & 0x7f).toByte; b(9) = (tagBytes & 0x7f).toByte
    b
  }
}

class Mp3Spec extends SparkSpec {
  import Mp3Fixture._

  test("CBR stream: frame chain, sizes, duration from the spec tables") {
    val frames = Array.fill(20)(frame(128)) // 417 bytes each
    val info = Mp3.parse(frames.flatten)
    assert(info.ok && info.version == "1" && info.layer == 3)
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.bitrateKbps == 128 && !info.vbr)
    assert(info.frames.length == 20)
    assert(info.frames.head == Mp3.Frame(0L, 417))
    assert(info.frames(1).offset == 417L)
    // 20 frames × 1152 samples / 44100 Hz = 522.4 ms
    assert(info.durationMs == math.round(20 * 1152.0 / 44100 * 1000))
  }

  test("ID3v2 tag is skipped; padding bit grows the frame by one byte") {
    val bytes = id3v2(300) ++ frame(128, padding = 1) ++ frame(128)
    val info = Mp3.parse(bytes)
    assert(info.ok && info.frames.length == 2)
    assert(info.frames.head == Mp3.Frame(310L, 418)) // padded frame
    assert(info.frames(1).offset == 310L + 418L)
  }

  test("VBR: mixed bitrates average and flag; frame sizes follow each header") {
    val bytes = frame(128) ++ frame(192) ++ frame(128) ++ frame(192)
    val info = Mp3.parse(bytes)
    assert(info.ok && info.vbr)
    assert(info.bitrateKbps == 160) // mean of 128/192/128/192
    assert(info.frames.map(_.size) == Seq(417, 626, 417, 626))
  }

  test("junk, lone false syncs, and truncation never parse as ok") {
    assert(!Mp3.parse(Array.fill[Byte](1000)(0x11)).ok)
    // a 0xFF 0xFB pattern inside junk with no second frame after the
    // computed size is rejected by the two-frame confirmation
    val junk = Array.fill[Byte](800)(0x33)
    junk(100) = 0xff.toByte; junk(101) = 0xfb.toByte; junk(102) = 0x90.toByte
    assert(!Mp3.parse(junk).ok)
    assert(!Mp3.parse(Array.empty[Byte]).ok)
    assert(!Mp3.parse(frame(128).take(3)).ok)
  }

  test("frameRanges samples frames distributed over the stream, bytes sliced") {
    import spark.implicits._
    val payload = Array.fill(10)(frame(128)).flatten
    val df = Seq((1L, payload), (2L, Array.fill[Byte](64)(9))).toDF("id", "data")
    val out = Mp3.frameRanges(df, "id", "data", maxFrames = 4)
      .orderBy("id").collect()
    val ok = out(0)
    assert(ok.getBoolean(1) && ok.getAs[Int]("n_frames") == 10)
    val frames = ok.getSeq[org.apache.spark.sql.Row](out(0).fieldIndex("frames"))
    assert(frames.length == 4)
    // every sampled frame starts with the sync bytes and is frame-sized
    frames.foreach { f =>
      val data = f.getAs[Array[Byte]]("data")
      assert(data.length == 417)
      assert((data(0) & 0xff) == 0xff && (data(1) & 0xff) == 0xfb)
      assert(f.getLong(0) % 417 == 0)
    }
    // frames spread over the stream, not just the head
    assert(frames.map(_.getLong(0)).toSet.size == 4)
    assert(frames.last.getLong(0) == 417L * 9)
    assert(!out(1).getBoolean(1)) // junk row flagged, job alive
  }
}
