package graft.ops

/** [[Flac]] decoder vs the INDEPENDENT [[FlacEncoder]] fixture — plus
  * external anchors (published CRC check values, RFC 3629 UTF-8 vectors,
  * the spec's zigzag table, and the stream-level PCM MD5 computed by two
  * separate implementations) so a constant transposed into BOTH sides
  * cannot keep the suite green (the r10 VP8L lesson).
  */
class FlacSpec extends graft.SparkSpec {

  // deterministic synthetic PCM: sawtooth + wobble, 16-bit range
  private def wave(n: Int, ch: Int, seed: Int): Array[Int] =
    Array.tabulate(n)(t =>
      ((t * (3 + seed % 5) + ch * 13 + seed * 17) % 2048) - 1024 + (t % 7) * (1 - 2 * (ch % 2)))

  private def roundTrip(channels: Array[Array[Int]], rate: Int,
      o: FlacEncoder.Options): Unit = {
    val bytes = FlacEncoder.encode(channels, rate, 16, o)
    val audio = Flac.decode(bytes)
    assert(audio.info.sampleRate == rate)
    assert(audio.info.channels == channels.length)
    assert(audio.info.bitsPerSample == 16)
    assert(audio.info.totalSamples == channels(0).length)
    for (c <- channels.indices)
      assert(audio.samples(c).toSeq == channels(c).toSeq, s"channel $c differs")
    assert(audio.md5Ok, "stream-level PCM MD5 mismatch")
  }

  test("published CRC check values pin both independent implementations") {
    val check = "123456789".getBytes("ASCII")
    // CRC-8 poly 0x07 and CRC-16/BUYPASS poly 0x8005 catalog values
    assert(Flac.crc8(check, 0, check.length) == 0xf4)
    assert(FlacEncoder.crc8(check.toSeq) == 0xf4)
    assert(Flac.crc16(check, 0, check.length) == 0xfee8)
    assert(FlacEncoder.crc16(check.toSeq) == 0xfee8)
  }

  test("coded numbers decode the RFC 3629 UTF-8 example sequences") {
    def read(bytes: Int*): Long =
      Flac.readCodedNumber(new Flac.BitReader(bytes.map(_.toByte).toArray, 0))
    assert(read(0x48) == 0x48L)
    assert(read(0xc2, 0xa9) == 0xa9L)
    assert(read(0xe2, 0x82, 0xac) == 0x20acL)
    assert(read(0xf0, 0x90, 0x8d, 0x88) == 0x10348L)
  }

  test("zigzag fold matches the spec's mapping table") {
    assert(Seq(0, -1, 1, -2, 2, -3, 3).map(FlacEncoder.fold) ==
      Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("mono fixed-predictor round trip with a short last frame") {
    roundTrip(Array(wave(1000, 0, 1)), 8000,
      FlacEncoder.Options(blockSize = 384))
  }

  test("verbatim and constant subframes") {
    roundTrip(Array(wave(600, 0, 2)), 16000,
      FlacEncoder.Options(blockSize = 200, strategy = "verbatim"))
    roundTrip(Array(Array.fill(500)(-137)), 22050,
      FlacEncoder.Options(blockSize = 250))
  }

  test("all four stereo channel assignments reconstruct exactly") {
    val l = wave(900, 0, 3)
    val r = wave(900, 1, 3)
    for (mode <- Seq(FlacEncoder.Independent, FlacEncoder.LeftSide,
        FlacEncoder.RightSide, FlacEncoder.MidSide))
      roundTrip(Array(l, r), 44100,
        FlacEncoder.Options(blockSize = 300, stereo = mode))
  }

  test("LPC subframes with a nonzero quantization shift") {
    roundTrip(Array(wave(800, 0, 4)), 32000,
      FlacEncoder.Options(blockSize = 400, strategy = "lpc",
        lpcCoefs = Array(5, -3), lpcShift = 1))
    roundTrip(Array(wave(800, 0, 5)), 32000,
      FlacEncoder.Options(blockSize = 400, strategy = "lpc",
        lpcCoefs = Array(3, -3, 1), lpcShift = 0))
  }

  test("rice2 (5-bit parameters), deep partitions, and the escape encoding") {
    roundTrip(Array(wave(1024, 0, 6)), 48000,
      FlacEncoder.Options(blockSize = 512, rice2 = true, maxPartitionOrder = 4))
    roundTrip(Array(wave(1024, 0, 7)), 48000,
      FlacEncoder.Options(blockSize = 512, forceEscape = true))
  }

  test("wasted bits shift out and back in") {
    val s = wave(700, 0, 8).map(_ * 4) // two guaranteed trailing zero bits
    roundTrip(Array(s), 11025,
      FlacEncoder.Options(blockSize = 350, wastedBits = 2))
  }

  test("corrupted frame bytes fail the CRC loudly instead of decoding garbage") {
    val bytes = FlacEncoder.encode(Array(wave(500, 0, 9)), 8000, 16,
      FlacEncoder.Options(blockSize = 250))
    // a flipped payload bit must throw (CRC mismatch, desynced reader, or
    // exhausted bits) — never return silently wrong PCM
    bytes(bytes.length - 40) = (bytes(bytes.length - 40) ^ 0x10).toByte
    intercept[Exception](Flac.decode(bytes))
    // a flipped HEADER bit is caught by the CRC-8 check specifically
    val bytes2 = FlacEncoder.encode(Array(wave(500, 0, 9)), 8000, 16,
      FlacEncoder.Options(blockSize = 250))
    val (_, framesAt) = Flac.readStreamInfo(bytes2)
    bytes2(framesAt + 2) = (bytes2(framesAt + 2) ^ 0x04).toByte
    val e = intercept[Exception](Flac.decode(bytes2))
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("sync") ||
      e.getMessage.contains("reserved"), e.getMessage)
  }

  test("audioFingerprint and decodeAudioFeatures route FLAC over real PCM") {
    import spark.implicits._
    val pcm = wave(4096, 0, 10)
    val flac = FlacEncoder.encode(Array(pcm), 8000, 16,
      FlacEncoder.Options(blockSize = 1024))
    // same PCM as WAV through javax.sound for a cross-format anchor
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val wavBytes = {
      val raw = new Array[Byte](pcm.length * 2)
      for (i <- pcm.indices) {
        raw(2 * i) = (pcm(i) & 0xff).toByte
        raw(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, pcm.length),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val df = Seq((1L, flac), (2L, wavBytes)).toDF("id", "data")
    val fps = Multimodal.audioFingerprint(df, "id", "data")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(fps(1L) != null, "FLAC payload must fingerprint")
    // identical audio ⇒ identical envelope hash across formats
    assert(fps(1L) == fps(2L), s"FLAC/WAV fingerprints differ: $fps")
    val feats = Multimodal.decodeAudioFeatures(df, "id", "data")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getDouble(2), r.getInt(3), r.getLong(4))).toMap
    assert(feats(1L) == ((true, 8000.0, 1, 4096L)), feats(1L))
    assert(feats(2L) == ((true, 8000.0, 1, 4096L)), feats(2L))
  }
}
