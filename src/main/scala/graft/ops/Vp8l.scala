package graft.ops

/** Pure-JVM VP8L (lossless WebP) pixel decoder — the tractable slice of the
  * media-codec gap: the bitstream is a compact public spec ("WebP Lossless
  * Bitstream Specification"), bounded state, no DSP. Implements the full
  * format: LSB-first bit reading, simple + code-length-coded canonical
  * Huffman trees (with repeats and the max-symbol shortcut), meta-Huffman
  * groups, color cache, LZ77 backward references with the 120-entry
  * 2-D distance map, and all four transforms (predictor, color transform,
  * subtract-green, color indexing with sub-byte packing) inverted in
  * reverse stream order.
  *
  * Reference behavior cross-checked against aqueducts' media handling
  * scope (the reference delegates decode to external codecs; see
  * /root/reference/aqueducts file table — no codec in core), so this is
  * beyond-reference surface. Decoding is total: any malformed input
  * returns None, never throws — a 100 TB scan must not die on one bad
  * payload.
  *
  * The 120-entry short-distance map is generated, not transcribed: plane
  * codes 1..120 enumerate the window offsets (dy 1..7, dx −8..7) ∪
  * (dy 0, dx −8..−1), sorted by ascending dx²+dy², ties by larger dy
  * first then ascending dx; code ↦ distance dy·width − dx (clamped ≥ 1).
  * Codes above 120 carry distance − 120 directly.
  */
object Vp8l {

  final case class Decoded(width: Int, height: Int, argb: Array[Int])

  private final class Eof extends RuntimeException("eof", null, false, false)
  private final class Bad(msg: String) extends RuntimeException(msg, null, false, false)

  // ------------------------------------------------------------ bit input

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0L
    def bit(): Int = {
      val i = (pos >> 3).toInt
      if (i >= b.length) throw new Eof
      val r = (b(i) >> (pos & 7).toInt) & 1
      pos += 1
      r
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  // ------------------------------------------------------- canonical trees

  /** Canonical prefix code from code lengths (RFC 1951 assignment: codes
    * increase with length, symbol order within a length; code bits are
    * consumed MSB-first off the LSB-first bitstream). A single used symbol
    * is a 0-bit code. Incomplete or oversubscribed codes are rejected.
    */
  private[ops] final class Huffman(lengths: Array[Int]) {
    private var loneSymbol = -1
    // binary tree in a flat array: node i children at child(i,bit); leaves
    // store symbol as -(sym+2), empty slots -1, root 0
    private var nodes: Array[Int] = null
    private var nodeCount = 1

    locally {
      val used = lengths.indices.filter(lengths(_) > 0)
      if (used.isEmpty) throw new Bad("empty code")
      else if (used.length == 1) loneSymbol = used.head
      else {
        val maxLen = used.map(lengths(_)).max
        if (maxLen > 15) throw new Bad("code length > 15")
        var kraft = 0L
        used.foreach(s => kraft += (1L << (15 - lengths(s))))
        if (kraft != (1L << 15)) throw new Bad("not a complete prefix code")
        val blCount = new Array[Int](maxLen + 1)
        used.foreach(s => blCount(lengths(s)) += 1)
        val nextCode = new Array[Int](maxLen + 2)
        var code = 0
        for (l <- 1 to maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code }
        nodes = Array.fill(2 * (2 * used.length))( -1)
        used.foreach { s =>
          val len = lengths(s)
          val c = nextCode(len); nextCode(len) += 1
          var n = 0
          var i = len - 1
          while (i >= 0) {
            val b = (c >> i) & 1
            val slot = 2 * n + b
            if (i == 0) nodes(slot) = -(s + 2)
            else {
              if (nodes(slot) == -1) {
                nodes(slot) = nodeCount
                if (2 * (nodeCount + 1) > nodes.length)
                  nodes = java.util.Arrays.copyOf(nodes, nodes.length * 2) match {
                    case a => java.util.Arrays.fill(a, nodes.length, a.length, -1); a
                  }
                nodeCount += 1
              }
              n = nodes(slot)
            }
            i -= 1
          }
        }
      }
    }

    def next(br: BitReader): Int = {
      if (loneSymbol >= 0) return loneSymbol
      var n = 0
      while (true) {
        val v = nodes(2 * n + br.bit())
        if (v <= -2) return -v - 2
        if (v == -1) throw new Bad("invalid code path")
        n = v
      }
      -1 // unreachable
    }

    /** Re-map the leaves of a {0,1}-shaped tree onto the listed symbols
      * (simple 2-symbol codes: bit b selects symbols(b) as listed).
      */
    private[Vp8l] def relabel(symbols: Array[Int]): Unit = {
      nodes(0) = -(symbols(0) + 2)
      nodes(1) = -(symbols(1) + 2)
    }

    private[ops] def simpleSymbol: Int = loneSymbol
  }

  private object Huffman {
    def simple(symbols: Array[Int]): Huffman = {
      if (symbols.length == 1) {
        val l = new Array[Int](symbols.head + 1)
        l(symbols.head) = 1
        // single-symbol: lengths array with one entry → 0-bit lone code
        new Huffman(l)
      } else {
        // the FIRST LISTED symbol takes code 0 (spec order, NOT numeric
        // order — a simple code may list the larger symbol first)
        val h = new Huffman(Array(1, 1)) // shape: two 1-bit codes
        h.relabel(symbols)
        h
      }
    }
  }

  /** kCodeLengthCodeOrder per the VP8L spec — the ONE copy both the
    * decoder and [[Vp8lEncoder]] use (round-10 review: a transposed
    * private copy kept every round-trip green while breaking interop
    * with real encoders; a single constant removes that failure mode).
    */
  private[ops] val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readHuffman(alphabetSize: Int, br: BitReader): Huffman = {
    if (br.bit() == 1) { // simple code
      val numSymbols = br.bit() + 1
      val first8 = br.bit()
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      val syms = if (numSymbols == 2) Array(s0, br.bits(8)) else Array(s0)
      if (syms.exists(_ >= alphabetSize)) throw new Bad("simple symbol out of range")
      if (numSymbols == 2 && syms(0) == syms(1)) throw new Bad("duplicate simple symbol")
      Huffman.simple(syms)
    } else {
      val numCl = 4 + br.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
      val clTree = new Huffman(clLens)
      var maxSymbol =
        if (br.bit() == 1) { val n = 2 + 2 * br.bits(3); 2 + br.bits(n) }
        else alphabetSize
      val lens = new Array[Int](alphabetSize)
      var prev = 8
      var sym = 0
      var done = false
      while (sym < alphabetSize && !done) {
        if (maxSymbol == 0) done = true
        else {
          maxSymbol -= 1
          val cl = clTree.next(br)
          if (cl < 16) {
            lens(sym) = cl; sym += 1
            if (cl != 0) prev = cl
          } else {
            val (rep, v) = cl match {
              case 16 => (3 + br.bits(2), prev)
              case 17 => (3 + br.bits(3), 0)
              case _ => (11 + br.bits(7), 0)
            }
            var r = 0
            while (r < rep && sym < alphabetSize) { lens(sym) = v; sym += 1; r += 1 }
          }
        }
      }
      new Huffman(lens)
    }
  }

  // ------------------------------------------------------------ transforms

  private sealed trait Transform
  private case object SubtractGreen extends Transform
  private final case class Predictor(bits: Int, image: Array[Int], subW: Int) extends Transform
  private final case class ColorXform(bits: Int, image: Array[Int], subW: Int) extends Transform
  private final case class ColorIndex(xbits: Int, table: Array[Int]) extends Transform

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  // 120-entry plane-code map (see object scaladoc for the derivation)
  private val DistanceMap: Array[(Int, Int)] = {
    val window =
      (for (dy <- 1 to 7; dx <- -8 to 7) yield (dx, dy)) ++
        (for (dx <- -8 to -1) yield (dx, 0))
    window.sortBy { case (dx, dy) => (dx * dx + dy * dy, -dy, dx) }.toArray
  }

  private def planeCodeToDistance(code: Int, width: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistanceMap(code - 1)
      math.max(1, dy * width - dx)
    }

  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val offset = (2 + (code & 1)) << eb
      offset + br.bits(eb) + 1
    }

  // ------------------------------------------------------- image decoding

  /** One entropy-coded image (the spatial image when `isLevel0`, else a
    * transform/meta sub-image). Returns pixels at the TRANSFORMED width
    * (color indexing packs pixels); `decode` re-expands.
    */
  private def decodeImageStream(
      wOrig: Int, h: Int, isLevel0: Boolean, br: BitReader): (Array[Int], Int) = {
    var w = wOrig
    var transforms: List[Transform] = Nil
    if (isLevel0) {
      var seen = Set.empty[Int]
      while (br.bit() == 1) {
        val t = br.bits(2)
        if (seen(t)) throw new Bad("transform repeated")
        seen += t
        t match {
          case 0 =>
            val bits = br.bits(3) + 2
            val sw = subSize(w, bits)
            val (img, _) = decodeImageStream(sw, subSize(h, bits), isLevel0 = false, br)
            transforms ::= Predictor(bits, img, sw)
          case 1 =>
            val bits = br.bits(3) + 2
            val sw = subSize(w, bits)
            val (img, _) = decodeImageStream(sw, subSize(h, bits), isLevel0 = false, br)
            transforms ::= ColorXform(bits, img, sw)
          case 2 => transforms ::= SubtractGreen
          case 3 =>
            val tsize = br.bits(8) + 1
            val (raw, _) = decodeImageStream(tsize, 1, isLevel0 = false, br)
            // palette entries are component deltas from the previous entry
            var i = 1
            while (i < raw.length) { raw(i) = addPixels(raw(i), raw(i - 1)); i += 1 }
            val xbits = if (tsize <= 2) 3 else if (tsize <= 4) 2 else if (tsize <= 16) 1 else 0
            transforms ::= ColorIndex(xbits, raw)
            w = subSize(w, xbits)
        }
      }
    }
    // color cache
    val cacheBits = if (br.bit() == 1) {
      val cb = br.bits(4)
      if (cb < 1 || cb > 11) throw new Bad("cache bits out of range")
      cb
    } else 0
    // meta-Huffman (spatial image only)
    var metaImage: Array[Int] = null
    var metaBits = 0
    var metaW = 0
    var numGroups = 1
    if (isLevel0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaW = subSize(w, metaBits)
      val (img, _) = decodeImageStream(metaW, subSize(h, metaBits), isLevel0 = false, br)
      metaImage = img
      var mx = 0
      img.foreach(p => mx = math.max(mx, (p >> 8) & 0xffff))
      numGroups = mx + 1
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val alphabets = Array(256 + 24 + cacheSize, 256, 256, 256, 40)
    val groups = Array.fill(numGroups)(alphabets.map(a => readHuffman(a, br)))
    // LZ77 + literals + cache over the (possibly packed) pixel grid
    val n = w * h
    val out = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(p: Int): Unit =
      if (cache != null) cache(((0x1e35a7bd * p) >>> (32 - cacheBits)).toInt) = p
    var pos = 0
    var group = groups(0)
    var lastMetaKey = -1
    while (pos < n) {
      if (metaImage != null) {
        val x = pos % w
        val y = pos / w
        val key = (y >> metaBits) * metaW + (x >> metaBits)
        if (key != lastMetaKey) {
          lastMetaKey = key
          group = groups((metaImage(key) >> 8) & 0xffff)
        }
      }
      val s = group(0).next(br)
      if (s < 256) {
        val g = s
        val r = group(1).next(br)
        val b = group(2).next(br)
        val a = group(3).next(br)
        val p = (a << 24) | (r << 16) | (g << 8) | b
        out(pos) = p
        cacheInsert(p)
        pos += 1
      } else if (s < 256 + 24) {
        val len = prefixValue(s - 256, br)
        val distCode = prefixValue(group(4).next(br), br)
        val dist = planeCodeToDistance(distCode, w)
        if (dist > pos || pos + len > n) throw new Bad("backref out of range")
        var i = 0
        while (i < len) {
          val p = out(pos - dist)
          out(pos) = p
          cacheInsert(p)
          pos += 1
          i += 1
        }
        lastMetaKey = -1 // force group re-lookup after a copy crosses blocks
      } else {
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) throw new Bad("cache miss-indexed")
        out(pos) = cache(idx)
        pos += 1
      }
    }
    // invert transforms, most recently read first (reverse stream order)
    var pixels = out
    var curW = w
    transforms.foreach {
      case SubtractGreen =>
        var i = 0
        while (i < pixels.length) { pixels(i) = addGreen(pixels(i)); i += 1 }
      case Predictor(bits, img, sw) =>
        inversePredictor(pixels, curW, h, bits, img, sw)
      case ColorXform(bits, img, sw) =>
        inverseColorTransform(pixels, curW, h, bits, img, sw)
      case ColorIndex(xbits, table) =>
        pixels = inverseColorIndex(pixels, curW, h, xbits, table, wOrig)
        curW = wOrig
    }
    (pixels, curW)
  }

  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  private def addGreen(p: Int): Int = {
    val g = (p >> 8) & 0xff
    val r = (((p >> 16) & 0xff) + g) & 0xff
    val b = ((p & 0xff) + g) & 0xff
    (p & 0xff00ff00) | (r << 16) | b
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) >> 1) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) << 8
    val bb = (((a & 0xff) + (b & 0xff)) >> 1)
    aa | rr | gg | bb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def c(sh: Int): Int =
      clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    def c(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clamp255(a + (a - b) / 2)
    }
    (c(24) << 24) | (c(16) << 16) | (c(8) << 8) | c(0)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int): Int = (p >>> sh) & 0xff
    val pAlpha = ch(l, 24) + ch(t, 24) - ch(tl, 24)
    val pRed = ch(l, 16) + ch(t, 16) - ch(tl, 16)
    val pGreen = ch(l, 8) + ch(t, 8) - ch(tl, 8)
    val pBlue = ch(l, 0) + ch(t, 0) - ch(tl, 0)
    val pl = math.abs(pAlpha - ch(l, 24)) + math.abs(pRed - ch(l, 16)) +
      math.abs(pGreen - ch(l, 8)) + math.abs(pBlue - ch(l, 0))
    val pt = math.abs(pAlpha - ch(t, 24)) + math.abs(pRed - ch(t, 16)) +
      math.abs(pGreen - ch(t, 8)) + math.abs(pBlue - ch(t, 0))
    if (pl < pt) l else t
  }

  private def inversePredictor(
      px: Array[Int], w: Int, h: Int, bits: Int, img: Array[Int], subW: Int): Unit = {
    var i = 0
    val n = w * h
    while (i < n) {
      val x = i % w
      val y = i / w
      val mode =
        if (x == 0 && y == 0) 0
        else if (y == 0) 1 // top row: left
        else if (x == 0) 2 // first column: top
        else (img((y >> bits) * subW + (x >> bits)) >> 8) & 0xff
      val l = if (i > 0) px(i - 1) else 0
      val t = if (i >= w) px(i - w) else 0
      val tl = if (i >= w && x > 0) px(i - w - 1) else 0
      // top-right wraps linearly: for the last column it is the first
      // pixel of the CURRENT row (index i-w+1), already decoded
      val tr = if (i >= w) px(i - w + 1) else 0
      val pred = mode match {
        case 0 => 0xff000000
        case 1 => l
        case 2 => t
        case 3 => tr
        case 4 => tl
        case 5 => avg2(avg2(l, tr), t)
        case 6 => avg2(l, tl)
        case 7 => avg2(l, t)
        case 8 => avg2(tl, t)
        case 9 => avg2(t, tr)
        case 10 => avg2(avg2(l, tl), avg2(t, tr))
        case 11 => select(l, t, tl)
        case 12 => clampAddSubtractFull(l, t, tl)
        case 13 => clampAddSubtractHalf(avg2(l, t), tl)
        case _ => throw new Bad(s"predictor mode $mode")
      }
      px(i) = addPixels(px(i), pred)
      i += 1
    }
  }

  private def inverseColorTransform(
      px: Array[Int], w: Int, h: Int, bits: Int, img: Array[Int], subW: Int): Unit = {
    def delta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5
    var i = 0
    val n = w * h
    while (i < n) {
      val x = i % w
      val y = i / w
      val cte = img((y >> bits) * subW + (x >> bits))
      val g2r = cte & 0xff
      val g2b = (cte >> 8) & 0xff
      val r2b = (cte >> 16) & 0xff
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + delta(g2r, g)) & 0xff
      val b = ((p & 0xff) + delta(g2b, g) + delta(r2b, r)) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  private def inverseColorIndex(
      px: Array[Int], packedW: Int, h: Int, xbits: Int,
      table: Array[Int], outW: Int): Array[Int] = {
    val out = new Array[Int](outW * h)
    val bpp = 8 >> xbits
    val mask = (1 << bpp) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < outW) {
        val packed = px(y * packedW + (x >> xbits))
        val green = (packed >> 8) & 0xff
        val idx =
          if (xbits == 0) green
          else (green >> ((x & ((1 << xbits) - 1)) * bpp)) & mask
        out(y * outW + x) = if (idx < table.length) table(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------------------- entry

  /** Decode a VP8L chunk payload (starting at the 0x2f signature byte).
    *
    * `maxPixels` bounds the output allocation: a malformed (or hostile)
    * 5-byte header can claim 16384×16384 and would otherwise force a
    * 1 GiB buffer per row before any bitstream validation runs — a scan
    * over untrusted payloads must bound its per-row memory. The default
    * (2^26 ≈ 67M pixels, 256 MiB) admits any realistic training-corpus
    * image; oversized claims return None like any other malformation.
    */
  def decode(payload: Array[Byte], maxPixels: Long = 1L << 26): Option[Decoded] =
    try {
      if (payload.length < 5 || (payload(0) & 0xff) != 0x2f) return None
      val br = new BitReader(java.util.Arrays.copyOfRange(payload, 1, payload.length))
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      if (w.toLong * h > maxPixels) return None
      br.bit() // alpha hint
      if (br.bits(3) != 0) return None // version must be 0
      val (pixels, outW) = decodeImageStream(w, h, isLevel0 = true, br)
      if (outW != w || pixels.length != w * h) None
      else Some(Decoded(w, h, pixels))
    } catch {
      // NOT OutOfMemoryError: maxPixels bounds this decoder's own
      // allocations, so an OOME here means executor-wide heap exhaustion
      // — masking that as a per-row "undecodable" would corrupt the scan
      case _: Eof | _: Bad | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  /** Decode a whole WebP container if (and only if) it is a lossless
    * (VP8L) file — [[WebP.riffChunks]] (the hostile-input-safe walk
    * shared with the format layer) finds the VP8L payload.
    */
  def decodeWebP(bytes: Array[Byte]): Option[Decoded] =
    WebP.riffChunks(bytes)
      .collectFirst { case ("VP8L", payload, size) if size >= 5 =>
        decode(java.util.Arrays.copyOfRange(bytes, payload, payload + size))
      }
      .flatten
}
