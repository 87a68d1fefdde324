package graft.ops

/** Independent FLAC fixture ENCODER — test apparatus for [[Flac]], written
  * separately from the decoder against the same public spec (RFC 9639) so
  * a transposed constant in one side breaks round-trips instead of hiding
  * (the r10 VP8L lesson). CRCs here are table-driven where the decoder's
  * are bitwise, and the spec pins both against published check values.
  *
  * Deliberately covers every decoder path: all four stereo modes,
  * constant/verbatim/fixed/LPC subframes, both Rice parameter widths, the
  * escape-to-raw partition encoding, wasted bits, multiple partition
  * orders, both explicit block-size header codes, and a skipped PADDING
  * metadata block.
  */
object FlacEncoder {

  sealed trait StereoMode
  case object Independent extends StereoMode
  case object LeftSide extends StereoMode
  case object RightSide extends StereoMode
  case object MidSide extends StereoMode

  final case class Options(
      blockSize: Int = 1152,
      stereo: StereoMode = Independent,
      strategy: String = "fixed", // fixed | verbatim | lpc
      lpcCoefs: Array[Int] = Array(2, -1),
      lpcShift: Int = 0,
      rice2: Boolean = false,
      maxPartitionOrder: Int = 2,
      forceEscape: Boolean = false,
      wastedBits: Int = 0)

  // table-driven CRCs (decoder's are bitwise — independent implementations)
  private val crc8Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i
    var b = 0
    while (b < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; b += 1 }
    c
  }
  private val crc16Table: Array[Int] = Array.tabulate(256) { i =>
    var c = i << 8
    var b = 0
    while (b < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; b += 1 }
    c
  }
  private[ops] def crc8(bytes: Seq[Byte]): Int =
    bytes.foldLeft(0)((c, x) => crc8Table(c ^ (x & 0xff)))
  private[ops] def crc16(bytes: Seq[Byte]): Int =
    bytes.foldLeft(0)((c, x) => ((c << 8) & 0xffff) ^ crc16Table(((c >> 8) ^ (x & 0xff)) & 0xff))

  private final class BitWriter {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def aligned: Boolean = nBits == 0
    def align(): Unit = while (nBits != 0) writeBit(0)
    def bytes: Array[Byte] = { require(aligned); out.toArray }
  }

  private def writeCodedNumber(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) { bw.writeBits(v, 8); return }
    var nBytes = 1
    while (v >= (1L << (6 - nBytes + nBytes * 6)) && nBytes < 6) nBytes += 1
    // lead byte: nBytes+1 ones, a zero, then the top payload bits
    val payloadTop = 6 - nBytes
    val lead = ((0xff << (7 - nBytes)) & 0xff) | ((v >> (nBytes * 6)) & ((1 << payloadTop) - 1)).toInt
    bw.writeBits(lead.toLong, 8)
    var i = nBytes - 1
    while (i >= 0) {
      bw.writeBits(0x80L | ((v >> (i * 6)) & 0x3f), 8)
      i -= 1
    }
  }

  private[ops] def fold(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63)) & 0xffffffffL

  private def riceCost(res: Array[Int], from: Int, until: Int, k: Int): Long = {
    var bits = 0L
    var i = from
    while (i < until) { bits += (fold(res(i)) >>> k) + 1 + k; i += 1 }
    bits
  }

  private def bitsNeededSigned(v: Int): Int = {
    // two's-complement width: smallest n with -2^(n-1) <= v < 2^(n-1)
    var n = 1
    while (!(v >= -(1L << (n - 1)) && v < (1L << (n - 1)))) n += 1
    n
  }

  private def writeResidual(bw: BitWriter, res: Array[Int], blockSize: Int,
      order: Int, o: Options): Unit = {
    val kBits = if (o.rice2) 5 else 4
    val escape = (1 << kBits) - 1
    bw.writeBits(if (o.rice2) 1L else 0L, 2)
    // largest partition order that divides the block and keeps partition 0
    // at least as long as the predictor order
    var porder = o.maxPartitionOrder
    while (porder > 0 &&
      (blockSize % (1 << porder) != 0 || (blockSize >> porder) <= order)) porder -= 1
    bw.writeBits(porder.toLong, 4)
    val nPart = 1 << porder
    var p = 0
    var idx = 0
    while (p < nPart) {
      val n = (blockSize >> porder) - (if (p == 0) order else 0)
      if (o.forceEscape) {
        var raw = 1
        var i = idx
        while (i < idx + n) { raw = math.max(raw, bitsNeededSigned(res(i))); i += 1 }
        require(raw <= 31, s"escape residual needs $raw bits (5-bit width field)")
        bw.writeBits(escape.toLong, kBits)
        bw.writeBits(raw.toLong, 5)
        i = idx
        while (i < idx + n) { bw.writeBits(res(i).toLong & ((1L << raw) - 1), raw); i += 1 }
      } else {
        var bestK = 0
        var bestCost = Long.MaxValue
        var k = 0
        while (k < escape) {
          val c = riceCost(res, idx, idx + n, k)
          if (c < bestCost) { bestCost = c; bestK = k }
          k += 1
        }
        bw.writeBits(bestK.toLong, kBits)
        var i = idx
        while (i < idx + n) {
          val u = fold(res(i))
          val q = (u >>> bestK).toInt
          var j = 0
          while (j < q) { bw.writeBit(0); j += 1 }
          bw.writeBit(1)
          bw.writeBits(u & ((1L << bestK) - 1), bestK)
          i += 1
        }
      }
      idx += n
      p += 1
    }
  }

  private def writeSubframe(bw: BitWriter, samples: Array[Int], bps: Int,
      o: Options): Unit = {
    val blockSize = samples.length
    bw.writeBit(0) // padding
    val wasted =
      if (o.wastedBits > 0 && samples.forall(s => (s & ((1 << o.wastedBits) - 1)) == 0))
        o.wastedBits
      else 0
    val s = if (wasted > 0) samples.map(_ >> wasted) else samples
    val ebps = bps - wasted
    def writeWasted(): Unit =
      if (wasted == 0) bw.writeBit(0)
      else {
        bw.writeBit(1)
        var i = 0
        while (i < wasted - 1) { bw.writeBit(0); i += 1 }
        bw.writeBit(1)
      }
    if (s.forall(_ == s(0))) {
      bw.writeBits(0L, 6); writeWasted()
      bw.writeBits(s(0).toLong & ((1L << ebps) - 1), ebps)
    } else if (o.strategy == "verbatim") {
      bw.writeBits(1L, 6); writeWasted()
      var i = 0
      while (i < blockSize) { bw.writeBits(s(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
    } else if (o.strategy == "lpc" && blockSize > o.lpcCoefs.length) {
      val order = o.lpcCoefs.length
      bw.writeBits((0x20 | (order - 1)).toLong, 6); writeWasted()
      var i = 0
      while (i < order) { bw.writeBits(s(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
      val precision = math.max(2, o.lpcCoefs.map(bitsNeededSigned).max)
      bw.writeBits((precision - 1).toLong, 4)
      bw.writeBits(o.lpcShift.toLong & 0x1f, 5)
      i = 0
      while (i < order) {
        bw.writeBits(o.lpcCoefs(i).toLong & ((1L << precision) - 1), precision)
        i += 1
      }
      val res = new Array[Int](blockSize)
      var t = order
      while (t < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += o.lpcCoefs(j).toLong * s(t - 1 - j); j += 1 }
        res(t) = s(t) - (acc >> o.lpcShift).toInt
        t += 1
      }
      writeResidual(bw, java.util.Arrays.copyOfRange(res, order, blockSize),
        blockSize, order, o)
    } else {
      // fixed predictor: best order 0..4 by total residual magnitude
      val maxOrder = math.min(4, blockSize - 1)
      var best: Array[Int] = null
      var bestOrder = 0
      var bestScore = Long.MaxValue
      var ord = 0
      while (ord <= maxOrder) {
        val res = fixedResidual(s, ord)
        var score = 0L
        var i = 0
        while (i < res.length) { score += math.abs(res(i).toLong); i += 1 }
        if (score < bestScore) { bestScore = score; best = res; bestOrder = ord }
        ord += 1
      }
      bw.writeBits((0x08 | bestOrder).toLong, 6); writeWasted()
      var i = 0
      while (i < bestOrder) { bw.writeBits(s(i).toLong & ((1L << ebps) - 1), ebps); i += 1 }
      writeResidual(bw, best, blockSize, bestOrder, o)
    }
  }

  private def fixedResidual(s: Array[Int], order: Int): Array[Int] = {
    val res = new Array[Int](s.length - order)
    var t = order
    while (t < s.length) {
      res(t - order) = order match {
        case 0 => s(t)
        case 1 => s(t) - s(t - 1)
        case 2 => s(t) - 2 * s(t - 1) + s(t - 2)
        case 3 => s(t) - 3 * s(t - 1) + 3 * s(t - 2) - s(t - 3)
        case 4 => s(t) - 4 * s(t - 1) + 6 * s(t - 2) - 4 * s(t - 3) + s(t - 4)
      }
      t += 1
    }
    res
  }

  /** Encode PCM (one Array[Int] per channel, equal lengths) to FLAC bytes. */
  def encode(channels: Array[Array[Int]], sampleRate: Int, bps: Int = 16,
      options: Options = Options()): Array[Byte] = {
    require(channels.nonEmpty && channels.forall(_.length == channels(0).length))
    val o = options
    val nCh = channels.length
    val total = channels(0).length.toLong
    require(o.stereo == Independent || nCh == 2, "stereo modes need 2 channels")

    val md5 = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytesPer = (bps + 7) / 8
      var t = 0
      while (t < total) {
        var c = 0
        while (c < nCh) {
          val v = channels(c)(t)
          var b = 0
          while (b < bytesPer) { md.update(((v >> (8 * b)) & 0xff).toByte); b += 1 }
          c += 1
        }
        t += 1
      }
      md.digest()
    }

    val header = new BitWriter
    header.writeBits(0x664c6143L, 32) // "fLaC"
    // STREAMINFO (first, not last)
    header.writeBits(0L, 1); header.writeBits(0L, 7); header.writeBits(34L, 24)
    header.writeBits(o.blockSize.toLong, 16)
    header.writeBits(o.blockSize.toLong, 16)
    header.writeBits(0L, 24); header.writeBits(0L, 24)
    header.writeBits(sampleRate.toLong, 20)
    header.writeBits((nCh - 1).toLong, 3)
    header.writeBits((bps - 1).toLong, 5)
    header.writeBits(total, 36)
    md5.foreach(b => header.writeBits(b.toLong & 0xff, 8))
    // PADDING (last) — exercises the decoder's block skipping
    header.writeBits(1L, 1); header.writeBits(1L, 7); header.writeBits(4L, 24)
    header.writeBits(0L, 32)

    val out = new scala.collection.mutable.ArrayBuffer[Byte]
    out ++= header.bytes

    var offset = 0
    var frameNo = 0L
    while (offset < total) {
      val bs = math.min(o.blockSize.toLong, total - offset).toInt
      val slice = channels.map(ch => java.util.Arrays.copyOfRange(ch, offset, offset + bs))
      val (subs, chAsgn, extraBit) = o.stereo match {
        case Independent => (slice, nCh - 1, Array.fill(nCh)(0))
        case LeftSide =>
          val side = Array.tabulate(bs)(t => slice(0)(t) - slice(1)(t))
          (Array(slice(0), side), 8, Array(0, 1))
        case RightSide =>
          val side = Array.tabulate(bs)(t => slice(0)(t) - slice(1)(t))
          (Array(side, slice(1)), 9, Array(1, 0))
        case MidSide =>
          val mid = Array.tabulate(bs)(t => (slice(0)(t) + slice(1)(t)) >> 1)
          val side = Array.tabulate(bs)(t => slice(0)(t) - slice(1)(t))
          (Array(mid, side), 10, Array(0, 1))
      }
      val bw = new BitWriter
      bw.writeBits(0x3ffeL, 14)
      bw.writeBit(0) // reserved
      bw.writeBit(0) // fixed blocking
      val bsCode = if (bs <= 256) 6 else 7
      bw.writeBits(bsCode.toLong, 4)
      bw.writeBits(0L, 4) // sample rate: from STREAMINFO
      bw.writeBits(chAsgn.toLong, 4)
      val ssCode = bps match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
        case _ => throw new IllegalArgumentException(s"unsupported bps $bps")
      }
      bw.writeBits(ssCode.toLong, 3)
      bw.writeBit(0) // reserved
      writeCodedNumber(bw, frameNo)
      if (bsCode == 6) bw.writeBits((bs - 1).toLong, 8)
      else bw.writeBits((bs - 1).toLong, 16)
      require(bw.aligned)
      bw.writeBits(crc8(bw.out.toSeq).toLong, 8)
      var c = 0
      while (c < subs.length) {
        writeSubframe(bw, subs(c), bps + extraBit(c), o)
        c += 1
      }
      bw.align()
      bw.writeBits(crc16(bw.out.toSeq).toLong, 16)
      out ++= bw.bytes
      offset += bs
      frameNo += 1
    }
    out.toArray
  }
}
