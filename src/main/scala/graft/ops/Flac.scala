package graft.ops

/** Pure-JVM FLAC decoder — the audio analogue of [[Vp8l]]: written from the
  * public bitstream spec (RFC 9639 / xiph.org FLAC format), no codec
  * dependency. Covers the full mandatory decode surface: STREAMINFO +
  * skipped metadata blocks, fixed-blocking frames, all four channel
  * assignments (independent, left/side, right/side, mid/side), constant /
  * verbatim / fixed-predictor (orders 0–4) / LPC subframes, wasted bits,
  * partitioned Rice residuals in both 4- and 5-bit parameter flavors with
  * the escape-to-raw encoding, and the three CRC layers (frame-header
  * CRC-8, frame CRC-16, stream-level PCM MD5).
  *
  * The reference ships no audio codec either (`aqueducts` delegates media
  * decode to external tooling) — this is beyond-reference capability so
  * [[Multimodal.audioFingerprint]] can run over REAL PCM for FLAC payloads
  * at scale: decode is pure per-row scan work, no shuffle.
  */
object Flac {

  final case class StreamInfo(
      minBlockSize: Int, maxBlockSize: Int,
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, md5: Array[Byte])

  /** Decoded audio: one Array[Int] per channel, `md5Ok` = the stream-level
    * MD5 of the decoded PCM matches STREAMINFO's (false when the encoder
    * left it zeroed = unknown).
    */
  final case class Audio(info: StreamInfo, samples: Array[Array[Int]]) {
    def md5Ok: Boolean =
      !info.md5.forall(_ == 0) &&
        java.util.Arrays.equals(pcmMd5(samples, info.bitsPerSample), info.md5)
  }

  /** MD5 over the canonical unencoded-PCM byte stream the spec prescribes:
    * samples interleaved by frame, little-endian, bps/8 bytes each.
    */
  private[ops] def pcmMd5(channels: Array[Array[Int]], bps: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = (bps + 7) / 8
    val n = if (channels.isEmpty) 0 else channels(0).length
    val buf = new Array[Byte](channels.length * bytesPer)
    var t = 0
    while (t < n) {
      var c = 0
      while (c < channels.length) {
        val v = channels(c)(t)
        var b = 0
        while (b < bytesPer) {
          buf(c * bytesPer + b) = ((v >> (8 * b)) & 0xff).toByte
          b += 1
        }
        c += 1
      }
      md.update(buf)
      t += 1
    }
    md.digest()
  }

  // ------------------------------------------------------------------ CRC

  /** CRC-8, poly x^8+x^2+x+1 (0x07), init 0, MSB-first — frame headers. */
  private[ops] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0, MSB-first — frames. */
  private[ops] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ bit reader

  private[ops] final class BitReader(val data: Array[Byte], startByte: Int) {
    var bytePos: Int = startByte
    var bitPos: Int = 0 // 0..7, MSB first

    def atEnd: Boolean = bytePos >= data.length

    def readBit(): Int = {
      val bit = (data(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      bit
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readBitsInt(n: Int): Int = readBits(n).toInt

    /** n-bit two's-complement signed read. */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 0) 0
      else if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt
      else v.toInt
    }

    /** Unary: zero bits counted until the terminating 1 bit. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }

    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
  }

  /** UTF-8-style coded number (frame numbers; extended to 36 bits). */
  private[ops] def readCodedNumber(br: BitReader): Long = {
    val b0 = br.readBitsInt(8)
    if ((b0 & 0x80) == 0) return b0.toLong
    var nBytes = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { nBytes += 1; mask >>= 1 }
    require(nBytes >= 1 && nBytes <= 6, s"invalid coded-number lead byte $b0")
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nBytes) {
      val b = br.readBitsInt(8)
      require((b & 0xc0) == 0x80, s"invalid coded-number continuation $b")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  // ------------------------------------------------------------- metadata

  def readStreamInfo(bytes: Array[Byte]): (StreamInfo, Int) = {
    require(bytes.length >= 8 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C',
      "not a FLAC stream (missing fLaC magic)")
    var pos = 4
    var si: StreamInfo = null
    var last = false
    while (!last) {
      val hdr = bytes(pos) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      if (btype == 0) {
        val br = new BitReader(bytes, pos + 4)
        val minB = br.readBitsInt(16)
        val maxB = br.readBitsInt(16)
        br.readBits(24); br.readBits(24) // min/max frame size (informational)
        val rate = br.readBits(20).toInt
        val ch = br.readBitsInt(3) + 1
        val bps = br.readBitsInt(5) + 1
        val total = br.readBits(36)
        val md5 = java.util.Arrays.copyOfRange(bytes, pos + 4 + 18, pos + 4 + 34)
        si = StreamInfo(minB, maxB, rate, ch, bps, total, md5)
      }
      pos += 4 + len
    }
    require(si != null, "FLAC stream lacks a STREAMINFO block")
    (si, pos)
  }

  // ---------------------------------------------------------------- frames

  private def decodeSubframe(br: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    require(br.readBit() == 0, "subframe padding bit set")
    val tpe = br.readBitsInt(6)
    val wasted =
      if (br.readBit() == 1) br.readUnary() + 1 else 0
    val ebps = bps - wasted
    val out = new Array[Int](blockSize)
    if (tpe == 0) { // constant
      val v = br.readSigned(ebps)
      java.util.Arrays.fill(out, v)
    } else if (tpe == 1) { // verbatim
      var i = 0
      while (i < blockSize) { out(i) = br.readSigned(ebps); i += 1 }
    } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= 4) { // fixed 001xxx
      val order = tpe & 0x07
      var i = 0
      while (i < order) { out(i) = br.readSigned(ebps); i += 1 }
      decodeResidual(br, blockSize, order, out)
      restoreFixed(out, order)
    } else if ((tpe & 0x20) != 0) { // LPC 1xxxxx
      val order = (tpe & 0x1f) + 1
      var i = 0
      while (i < order) { out(i) = br.readSigned(ebps); i += 1 }
      val precision = br.readBitsInt(4) + 1
      require(precision <= 15, "invalid LPC precision escape")
      val shift = br.readSigned(5)
      require(shift >= 0, "negative LPC shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.readSigned(precision); i += 1 }
      decodeResidual(br, blockSize, order, out)
      var t = order
      while (t < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(t - 1 - j); j += 1 }
        out(t) += (acc >> shift).toInt
        t += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe type $tpe")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Partitioned Rice residual decode INTO `out(order until blockSize)` —
    * values land as residuals; the caller applies its predictor.
    */
  private def decodeResidual(br: BitReader, blockSize: Int, order: Int,
      out: Array[Int]): Unit = {
    val method = br.readBitsInt(2)
    require(method <= 1, s"reserved residual method $method")
    val kBits = if (method == 0) 4 else 5
    val escape = (1 << kBits) - 1
    val porder = br.readBitsInt(4)
    val nPart = 1 << porder
    require(blockSize % nPart == 0, "partition order does not divide block size")
    var idx = order
    var p = 0
    while (p < nPart) {
      val n = (blockSize >> porder) - (if (p == 0) order else 0)
      require(n >= 0, "first partition shorter than predictor order")
      val k = br.readBitsInt(kBits)
      if (k == escape) {
        val raw = br.readBitsInt(5)
        var i = 0
        while (i < n) {
          out(idx) = if (raw == 0) 0 else br.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = br.readUnary()
          val u = (q.toLong << k) | br.readBits(k)
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // unfold zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  private def restoreFixed(s: Array[Int], order: Int): Unit = {
    var t = order
    order match {
      case 0 => ()
      case 1 => while (t < s.length) { s(t) += s(t - 1); t += 1 }
      case 2 => while (t < s.length) { s(t) += 2 * s(t - 1) - s(t - 2); t += 1 }
      case 3 => while (t < s.length) {
        s(t) += 3 * s(t - 1) - 3 * s(t - 2) + s(t - 3); t += 1 }
      case 4 => while (t < s.length) {
        s(t) += 4 * s(t - 1) - 6 * s(t - 2) + 4 * s(t - 3) - s(t - 4); t += 1 }
      case _ => throw new IllegalArgumentException(s"fixed order $order")
    }
  }

  /** Decode one frame at the reader's position; returns the per-channel
    * block and verifies both frame CRCs.
    */
  private def decodeFrame(br: BitReader, si: StreamInfo): Array[Array[Int]] = {
    val frameStart = br.bytePos
    require(br.bitPos == 0, "frame does not start byte-aligned")
    val sync = br.readBits(14)
    require(sync == 0x3ffe, f"bad frame sync $sync%x at byte $frameStart")
    br.readBit() // reserved
    br.readBit() // blocking strategy (0 fixed / 1 variable — both decodable)
    val bsCode = br.readBitsInt(4)
    val srCode = br.readBitsInt(4)
    val chAsgn = br.readBitsInt(4)
    val ssCode = br.readBitsInt(3)
    br.readBit() // reserved
    readCodedNumber(br)
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("reserved block size code 0")
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.readBitsInt(8) + 1
      case 7 => br.readBitsInt(16) + 1
      case c => 256 << (c - 8)
    }
    srCode match { // value consumed; STREAMINFO's rate is authoritative here
      case 12 => br.readBits(8)
      case 13 | 14 => br.readBits(16)
      case 15 => throw new IllegalArgumentException("invalid sample rate code")
      case _ => ()
    }
    val bps = ssCode match {
      case 0 => si.bitsPerSample
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case c => throw new IllegalArgumentException(s"reserved sample size code $c")
    }
    val headerEnd = { require(br.bitPos == 0, "frame header not byte-aligned"); br.bytePos }
    val crc8Read = br.readBitsInt(8)
    require(crc8Read == crc8(br.data, frameStart, headerEnd),
      s"frame header CRC-8 mismatch at byte $frameStart")

    require(chAsgn <= 10, s"reserved channel assignment $chAsgn")
    val channels = if (chAsgn <= 7) chAsgn + 1 else 2
    require(channels == si.channels, "frame channel count differs from STREAMINFO")
    val sub = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      // the difference channel carries one extra bit
      val extra = chAsgn match {
        case 8 => if (c == 1) 1 else 0  // left/side
        case 9 => if (c == 0) 1 else 0  // right/side
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      sub(c) = decodeSubframe(br, blockSize, bps + extra)
      c += 1
    }
    br.alignToByte()
    val frameEnd = br.bytePos
    val crc16Read = br.readBitsInt(16)
    require(crc16Read == crc16(br.data, frameStart, frameEnd),
      s"frame CRC-16 mismatch at byte $frameStart")

    chAsgn match {
      case 8 => // left/side: right = left - side
        var t = 0
        while (t < blockSize) { sub(1)(t) = sub(0)(t) - sub(1)(t); t += 1 }
      case 9 => // right/side: left = right + side
        var t = 0
        while (t < blockSize) {
          val side = sub(0)(t)
          sub(0)(t) = sub(1)(t) + side
          t += 1
        }
      case 10 => // mid/side
        var t = 0
        while (t < blockSize) {
          val side = sub(1)(t)
          val mid = (sub(0)(t) << 1) | (side & 1)
          sub(0)(t) = (mid + side) >> 1
          sub(1)(t) = (mid - side) >> 1
          t += 1
        }
      case _ => ()
    }
    sub
  }

  /** Full-stream decode. Trusts STREAMINFO's totalSamples for sizing (the
    * fixture encoder always records it); a zero totalSamples falls back to
    * decoding until the bytes run out.
    */
  def decode(bytes: Array[Byte]): Audio = {
    val (si, framesAt) = readStreamInfo(bytes)
    val br = new BitReader(bytes, framesAt)
    val known = si.totalSamples > 0
    val bufs = Array.fill(si.channels) {
      val b = new scala.collection.mutable.ArrayBuilder.ofInt
      if (known && si.totalSamples <= Int.MaxValue) b.sizeHint(si.totalSamples.toInt)
      b
    }
    var got = 0L
    while ((known && got < si.totalSamples) || (!known && !br.atEnd)) {
      val block = decodeFrame(br, si)
      var c = 0
      while (c < si.channels) { bufs(c) ++= block(c); c += 1 }
      got += block(0).length
    }
    require(!known || got == si.totalSamples,
      s"decoded $got samples, STREAMINFO promised ${si.totalSamples}")
    val audio = Audio(si, bufs.map(_.result()))
    // verify the stream-level PCM MD5 when the encoder recorded one — the
    // only layer that catches a decode-MATH bug (the CRCs protect the
    // encoded bits, not the reconstruction)
    require(si.md5.forall(_ == 0) || audio.md5Ok,
      "decoded PCM fails the STREAMINFO MD5 — decoder/stream mismatch")
    audio
  }
}
