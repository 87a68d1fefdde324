package graft.ops

/** Minimal spec-conformant VP8L (lossless WebP) encoder — the fixture
  * source for [[Vp8l]]'s gates and specs. Deliberately simple, never
  * clever: per-channel prefix codes are either a SIMPLE code (one or two
  * symbols) or a two-level complete canonical code over exactly the used
  * symbols (the `2^k − n` shortest-length trick keeps Kraft equality),
  * written through the code-length code with no repeat ops. Optional
  * subtract-green transform and optional row-repeat LZ77 backrefs
  * (distance encoded as plane code `dist + 120`) exercise the decoder's
  * transform and copy paths. No color cache, no meta-Huffman, no
  * predictor/color/indexing transforms — unit vectors cover those decoder
  * paths by hand-built streams.
  *
  * Encoder and decoder compute canonical codes INDEPENDENTLY (the encoder
  * assigns codes here, the decoder rebuilds them from lengths in
  * [[Vp8l.Huffman]]), so a round-trip exercises the canonical-code
  * contract rather than assuming it.
  */
object Vp8lEncoder {

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def bit(v: Int): Unit = {
      cur |= (v & 1) << nbits
      nbits += 1
      if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { bit((v >> i) & 1); i += 1 }
    }
    /** a prefix code: MSB first (RFC 1951 packing on an LSB-first stream) */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bit((c >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      val out = buf.clone()
      if (nbits > 0) out += cur.toByte
      out.toArray
    }
  }

  /** Canonical code table over `lengths` (same RFC 1951 assignment the
    * decoder uses): symbol -> (code, length).
    */
  private def canonical(lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val maxLen = lengths.values.max
    val blCount = new Array[Int](maxLen + 1)
    lengths.values.foreach(l => blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 1)
    var c = 0
    for (l <- 1 to maxLen) { c = (c + blCount(l - 1)) << 1; nextCode(l) = c }
    lengths.toSeq.sortBy(_._1).map { case (sym, len) =>
      val code = nextCode(len); nextCode(len) += 1
      sym -> (code, len)
    }.toMap
  }

  /** Two-level complete code lengths over `syms` (ascending): with
    * n symbols and k = ceil(log2 n), the 2^k − n smallest symbols take
    * length k−1 and the rest length k — Kraft-exact.
    */
  private def twoLevelLengths(syms: Seq[Int]): Map[Int, Int] = {
    val n = syms.length
    require(n >= 2)
    var k = 1
    while ((1 << k) < n) k += 1
    val short = (1 << k) - n
    syms.sorted.zipWithIndex.map { case (s, i) =>
      s -> (if (i < short && k > 1) k - 1 else k)
    }.toMap
  }

  private def ClOrder = Vp8l.ClOrder // the single spec-order constant

  private final case class Tree(write: (BitWriter, Int) => Unit)

  /** Write the prefix-code header for `syms` over `alphabetSize` and
    * return the symbol writer. Simple codes need symbols ≤ 255.
    */
  private def writeTree(bw: BitWriter, syms: Seq[Int], alphabetSize: Int): Tree = {
    val distinct = syms.distinct.sorted
    if (distinct.length == 1 && distinct.head <= 255) {
      bw.bit(1) // simple
      bw.bit(0) // num_symbols - 1 = 0
      val s = distinct.head
      if (s <= 1) { bw.bit(0); bw.bits(s, 1) }
      else { bw.bit(1); bw.bits(s, 8) }
      Tree((_, _) => ()) // zero bits per symbol
    } else if (distinct.length == 2 && distinct.last <= 255) {
      bw.bit(1) // simple
      bw.bit(1) // two symbols
      val s0 = distinct.head
      if (s0 <= 1) { bw.bit(0); bw.bits(s0, 1) }
      else { bw.bit(1); bw.bits(s0, 8) }
      bw.bits(distinct.last, 8)
      // decoder builds the canonical 1-bit code over {s0, s1}: smaller
      // symbol gets code 0
      val codes = canonical(Map(distinct.head -> 1, distinct.last -> 1))
      Tree((w, s) => { val (c, l) = codes(s); w.code(c, l) })
    } else {
      val lens = twoLevelLengths(distinct)
      bw.bit(0) // not simple
      // code-length code over the length VALUES used plus 0 (for gaps)
      val gaps = alphabetSize > distinct.length
      val clSyms = (lens.values.toSeq ++ (if (gaps) Seq(0) else Nil)).distinct.sorted
      val clLens: Map[Int, Int] =
        if (clSyms.length == 1) Map(clSyms.head -> 1)
        else twoLevelLengths(clSyms)
      bw.bits(19 - 4, 4) // num_code_lengths = 19: cover every CL position
      for (i <- 0 until 19) bw.bits(clLens.getOrElse(ClOrder(i), 0), 3)
      // a single used CL symbol is a LONE code: the decoder consumes zero
      // bits per length (the single-symbol special case), so write zero
      val clCodes =
        if (clLens.size == 1) Map(clLens.head._1 -> ((0, 0)))
        else canonical(clLens)
      bw.bit(0) // no max_symbol shortcut
      val lensArr = (0 until alphabetSize).map(s => lens.getOrElse(s, 0))
      lensArr.foreach { l => val (c, len) = clCodes(l); bw.code(c, len) }
      val codes = canonical(lens)
      Tree((w, s) => { val (c, l) = codes(s); w.code(c, l) })
    }
  }

  /** value (≥ 1) -> (prefix code, extra bits value, extra bits count) */
  private[ops] def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    val x = v - 1
    if (x < 4) (x, 0, 0)
    else {
      val n = 31 - Integer.numberOfLeadingZeros(x)
      val half = (1 << n) + (1 << (n - 1))
      val code = 2 * n + (if (x >= half) 1 else 0)
      val offset = (2 + (code & 1)) << ((code - 2) >> 1)
      (code, x - offset, (code - 2) >> 1)
    }
  }

  /** Encode `argb` (row-major, packed ARGB ints) as a complete WebP file.
    *
    * `rowRepeatRefs = true` replaces any row identical to the previous
    * one with a single LZ77 backref (length = width, distance = width via
    * plane code width + 120) — the copy-path fixture.
    */
  def encode(
      w: Int, h: Int, argb: Array[Int],
      subtractGreen: Boolean = false,
      rowRepeatRefs: Boolean = false): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384)
    require(argb.length == w * h)
    val px =
      if (!subtractGreen) argb
      else argb.map { p =>
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      }
    val bw = new BitWriter
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(if (argb.exists(p => (p >>> 24) != 0xff)) 1 else 0) // alpha hint
    bw.bits(0, 3) // version
    if (subtractGreen) { bw.bit(1); bw.bits(2, 2) }
    bw.bit(0) // no (more) transforms
    bw.bit(0) // no color cache
    bw.bit(0) // no meta-Huffman
    // plan the token stream first so tree symbol sets are exact
    val rowRef = new Array[Boolean](h)
    if (rowRepeatRefs && h > 1) {
      var y = 1
      while (y < h) {
        var same = true
        var x = 0
        while (same && x < w) { same = px(y * w + x) == px((y - 1) * w + x); x += 1 }
        rowRef(y) = same
        y += 1
      }
    }
    val greens = scala.collection.mutable.ArrayBuffer.empty[Int]
    val reds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val blues = scala.collection.mutable.ArrayBuffer.empty[Int]
    val alphas = scala.collection.mutable.ArrayBuffer.empty[Int]
    val dists = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (y <- 0 until h) {
      if (rowRef(y)) {
        greens += 256 + prefixEncode(w)._1
        dists += prefixEncode(w + 120)._1
      } else for (x <- 0 until w) {
        val p = px(y * w + x)
        greens += (p >> 8) & 0xff
        reds += (p >> 16) & 0xff
        blues += p & 0xff
        alphas += (p >>> 24) & 0xff
      }
    }
    val greenTree = writeTree(bw, greens.toSeq, 256 + 24)
    val redTree = writeTree(bw, if (reds.isEmpty) Seq(0) else reds.toSeq, 256)
    val blueTree = writeTree(bw, if (blues.isEmpty) Seq(0) else blues.toSeq, 256)
    val alphaTree = writeTree(bw, if (alphas.isEmpty) Seq(0) else alphas.toSeq, 256)
    val distTree = writeTree(bw, if (dists.isEmpty) Seq(0) else dists.toSeq, 40)
    for (y <- 0 until h) {
      if (rowRef(y)) {
        val (lc, lx, ln) = prefixEncode(w)
        greenTree.write(bw, 256 + lc)
        bw.bits(lx, ln)
        val (dc, dx, dn) = prefixEncode(w + 120)
        distTree.write(bw, dc)
        bw.bits(dx, dn)
      } else for (x <- 0 until w) {
        val p = px(y * w + x)
        greenTree.write(bw, (p >> 8) & 0xff)
        redTree.write(bw, (p >> 16) & 0xff)
        blueTree.write(bw, p & 0xff)
        alphaTree.write(bw, (p >>> 24) & 0xff)
      }
    }
    container(bw.toBytes)
  }

  /** Wrap a VP8L bitstream body (post-signature) in signature + RIFF. */
  private[ops] def container(body: Array[Byte]): Array[Byte] = {
    val payload = 0x2f.toByte +: body
    val chunkSize = payload.length
    val padded = chunkSize + (chunkSize & 1)
    val riffSize = 4 + 8 + padded
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("ISO-8859-1")).putInt(riffSize)
    out.put("WEBP".getBytes("ISO-8859-1"))
    out.put("VP8L".getBytes("ISO-8859-1")).putInt(chunkSize)
    out.put(payload)
    if ((chunkSize & 1) == 1) out.put(0.toByte)
    out.array()
  }
}
