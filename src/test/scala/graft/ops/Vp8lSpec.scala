package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** VP8L decoder: encoder round-trips for the paths [[Vp8lEncoder]] emits,
  * plus HAND-SCRIPTED bitstreams (independent of the encoder's writing
  * code) for the paths it does not — color cache, color indexing with
  * sub-byte packing, predictor and color transforms, simple codes listed
  * in non-numeric order. The hand vectors are built bit-by-bit from the
  * spec text, so encoder/decoder bugs cannot cancel out there.
  */
class Vp8lSpec extends AnyFunSuite {

  private def rngImage(w: Int, h: Int, seed: Long, opaque: Boolean = true): Array[Int] = {
    val r = new scala.util.Random(seed)
    Array.fill(w * h) {
      val a = if (opaque) 0xff else r.nextInt(256)
      (a << 24) | r.nextInt(0x1000000)
    }
  }

  private def roundTrip(w: Int, h: Int, px: Array[Int],
      sg: Boolean = false, refs: Boolean = false): Unit = {
    val bytes = Vp8lEncoder.encode(w, h, px, subtractGreen = sg, rowRepeatRefs = refs)
    val d = Vp8l.decodeWebP(bytes)
      .getOrElse(fail(s"decode failed (w=$w h=$h sg=$sg refs=$refs)"))
    assert(d.width == w && d.height == h)
    assert(d.argb.toSeq == px.toSeq, s"pixels differ (w=$w h=$h sg=$sg refs=$refs)")
    // the container parses as lossless WebP through the format layer too
    val info = WebP.parse(bytes)
    assert(info.ok && info.format == "lossless" && info.width == w && info.height == h)
  }

  test("round-trip: literal images, various dims") {
    roundTrip(1, 1, Array(0xff123456))
    roundTrip(7, 3, rngImage(7, 3, 1L))
    roundTrip(17, 9, rngImage(17, 9, 2L))
    roundTrip(64, 1, rngImage(64, 1, 3L))
    roundTrip(1, 33, rngImage(1, 33, 4L))
  }

  test("round-trip: subtract-green transform") {
    roundTrip(13, 11, rngImage(13, 11, 5L), sg = true)
  }

  test("round-trip: translucent pixels set the alpha hint and survive") {
    val px = rngImage(9, 4, 6L, opaque = false)
    roundTrip(9, 4, px)
    val bytes = Vp8lEncoder.encode(9, 4, px)
    assert(WebP.parse(bytes).hasAlpha == px.exists(p => (p >>> 24) != 0xff))
  }

  test("round-trip: row-repeat backrefs (LZ77 copy path, plane code > 120)") {
    val base = rngImage(19, 1, 7L)
    // rows: A A A B B A — repeats exercise length=w copies
    val rows = Seq(base, base, base, rngImage(19, 1, 8L))
    val px = (rows(0) ++ rows(0) ++ rows(0) ++ rows(3) ++ rows(3) ++ rows(0))
    // last 'A' row is NOT equal to its predecessor, so it re-encodes as
    // literals; the middle repeats become copies
    roundTrip(19, 6, px, refs = true)
    roundTrip(19, 6, px, sg = true, refs = true)
  }

  test("round-trip: constant and two-valued channels take the simple-code paths") {
    // constant everything -> every tree is a 1-symbol simple code
    roundTrip(5, 5, Array.fill(25)(0xff884422))
    // two-valued channels -> 2-symbol simple codes
    val r = new scala.util.Random(9)
    roundTrip(8, 8, Array.fill(64) {
      0xff000000 | (Seq(0x10, 0xf0)(r.nextInt(2)) << 16) |
        (Seq(3, 200)(r.nextInt(2)) << 8) | Seq(0, 255)(r.nextInt(2))
    })
  }

  test("round-trip: channels using ALL 256 values (single-CL-symbol tree)") {
    // every red/green/blue value appears -> code lengths are uniform, the
    // code-length tree has ONE used symbol, and the decoder's lone-symbol
    // rule reads each length in zero bits; the encoder must write zero
    // bits too (round-10 regression: it wrote one per position)
    val px = Array.tabulate(16 * 16) { i =>
      (0xff << 24) | (i << 16) | (((i * 7) % 256) << 8) | ((i * 11) % 256)
    }
    roundTrip(16, 16, px)
  }

  test("malformed inputs decode to None, never throw") {
    assert(Vp8l.decodeWebP(Array[Byte]()) == None)
    assert(Vp8l.decodeWebP("RIFFxxxxWEBP".getBytes("ISO-8859-1")) == None)
    assert(Vp8l.decode(Array[Byte](0x2e, 0, 0, 0, 0)) == None) // bad signature
    val good = Vp8lEncoder.encode(6, 6, rngImage(6, 6, 10L))
    (8 until good.length by 7).foreach { cut =>
      Vp8l.decodeWebP(java.util.Arrays.copyOf(good, cut)) // None or Some, no throw
    }
    val r = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val junk = Array.fill(r.nextInt(200) + 20)(r.nextInt(256).toByte)
      Vp8l.decode(junk) // must not throw
    }
    // a hostile header claiming 16384×16384 must refuse BEFORE allocating
    val huge = new Bits
    huge.put(16383, 14).put(16383, 14).put(0, 1).put(0, 3)
    assert(Vp8l.decode(huge.toPayload) == None)
  }

  // ------------------------------------------------- hand-scripted streams

  /** Test-side bit builder: bits LSB-first, codes MSB-first, matching the
    * spec's packing rules — NOT the encoder's writer.
    */
  private final class Bits {
    private val b = scala.collection.mutable.ArrayBuffer.empty[Int]
    def put(v: Int, n: Int): Bits = { (0 until n).foreach(i => b += ((v >> i) & 1)); this }
    def code(c: Int, len: Int): Bits = { (len - 1 to 0 by -1).foreach(i => b += ((c >> i) & 1)); this }
    def toPayload: Array[Byte] = {
      val out = new Array[Byte]((b.length + 7) / 8 + 1)
      out(0) = 0x2f
      b.zipWithIndex.foreach { case (bit, i) =>
        if (bit == 1) out(1 + (i >> 3)) = (out(1 + (i >> 3)) | (1 << (i & 7))).toByte
      }
      out
    }
  }

  /** header for w×h, then no transform / cache / meta by default */
  private def header(b: Bits, w: Int, h: Int): Bits =
    b.put(w - 1, 14).put(h - 1, 14).put(0, 1).put(0, 3)

  /** 1-symbol simple code: [1, 0, first8, sym] */
  private def simple1(b: Bits, sym: Int): Bits =
    if (sym <= 1) b.put(1, 1).put(0, 1).put(0, 1).put(sym, 1)
    else b.put(1, 1).put(0, 1).put(1, 1).put(sym, 8)

  test("hand vector: simple 2-symbol code listed LARGER-first assigns code 0 to it") {
    // 2×1 image; green tree lists symbols (200, 10) in that order, so bit
    // 0 must decode to 200 and bit 1 to 10 — a decoder that canonicalizes
    // by symbol order would flip them
    val b = new Bits
    header(b, 2, 1)
    b.put(0, 1) // no transforms
    b.put(0, 1) // no cache
    b.put(0, 1) // no meta
    b.put(1, 1).put(1, 1).put(1, 1).put(200, 8).put(10, 8) // green: simple, 2 syms, 8-bit first
    simple1(b, 7)   // red
    simple1(b, 9)   // blue
    simple1(b, 255) // alpha
    simple1(b, 0)   // distance (unused)
    b.put(0, 1) // first pixel green -> code 0 -> 200
    b.put(1, 1) // second pixel green -> code 1 -> 10
    val d = Vp8l.decode(b.toPayload).getOrElse(fail("decode failed"))
    assert(((d.argb(0) >> 8) & 0xff) == 200 && ((d.argb(1) >> 8) & 0xff) == 10)
    assert(((d.argb(0) >> 16) & 0xff) == 7 && (d.argb(0) & 0xff) == 9 && (d.argb(0) >>> 24) == 255)
  }

  test("hand vector: color cache hit returns the cached pixel") {
    // cache_bits=1 (2 slots); green alphabet = 256+24+2 = 282. Stream:
    // literal pixel P, then cache symbol 280+slot(P) — second pixel == P.
    val p = 0xff112233
    val slot = ((0x1e35a7bd * p) >>> 31) // 32 - cache_bits
    val b = new Bits
    header(b, 2, 1)
    b.put(0, 1) // no transforms
    b.put(1, 1).put(1, 4) // cache on, cache_bits=1
    b.put(0, 1) // no meta
    // green tree: symbols {0x22, 280+slot}: 280+slot > 255 -> need a
    // normal (code-length-coded) tree; use the 2-symbol 1-bit shape via
    // CL coding: lengths 1 for both, 0 elsewhere.
    writeTwoSymbolNormal(b, 0x22, 280 + slot, 282)
    simple1(b, 0x11) // red
    simple1(b, 0x33) // blue
    simple1(b, 0xff) // alpha
    simple1(b, 0)    // distance
    b.put(0, 1) // green code 0 -> literal 0x22 (smaller symbol)
    b.put(1, 1) // green code 1 -> cache hit
    val d = Vp8l.decode(b.toPayload).getOrElse(fail("decode failed"))
    assert(d.argb.toSeq == Seq(p, p))
  }

  /** normal-coded tree over exactly two symbols (ascending), 1 bit each:
    * CL lengths: {0 -> 1, 1 -> 1} (symbol 0 = gap filler, symbol 1 = len).
    * Stream: not-simple, num_code_lengths=19, 3-bit CL lens in ClOrder,
    * no max_symbol, then per-position CL codes with 17/18 zero-runs NOT
    * used (every position written explicitly would be 282 codes — use
    * repeat-zeros instead for gaps).
    */
  private def writeTwoSymbolNormal(b: Bits, s0: Int, s1: Int, alphabetSize: Int): Unit = {
    require(s0 < s1 && s1 < alphabetSize)
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    b.put(0, 1) // not simple
    b.put(19 - 4, 4)
    // CL code lengths: symbol 0 -> 2, symbol 1 -> 2, symbol 18 -> 1 (for
    // long zero runs); canonical: 18 gets code 0; 0 -> 10, 1 -> 11
    val clLen = Map(0 -> 2, 1 -> 2, 18 -> 1)
    order.foreach(s => b.put(clLen.getOrElse(s, 0), 3))
    b.put(0, 1) // no max_symbol
    val cl = Map(18 -> (0, 1), 0 -> (2, 2), 1 -> (3, 2))
    def clCode(sym: Int): Unit = { val (c, l) = cl(sym); b.code(c, l) }
    def zeros(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (left >= 11) { val take = math.min(left, 138); clCode(18); b.put(take - 11, 7); left -= take }
        else { clCode(0); left -= 1 }
      }
    }
    zeros(s0)
    clCode(1)
    zeros(s1 - s0 - 1)
    clCode(1)
    zeros(alphabetSize - s1 - 1) // the decoder reads lengths to the END
  }

  test("hand vector: color indexing with 1-bit packing expands indices") {
    // 8×1 image, palette of 2 colors -> xbits=3, packed width 1: the single
    // packed pixel's green byte holds 8 one-bit indices, LSB = leftmost.
    val c0 = 0xff00aa00
    val c1 = 0xffff0055
    val bitsPattern = Integer.parseInt("10110001", 2) // x0 reads LSB
    val b = new Bits
    header(b, 8, 1)
    b.put(1, 1).put(3, 2) // transform: color indexing
    b.put(2 - 1, 8) // table size 2
    // palette sub-image (2×1, is_level0=false): no transforms; cache bit,
    // meta NOT read (not level0). Entries are deltas: first c0, second
    // c1 - c0 per channel.
    b.put(0, 1) // no cache
    val d1 = (((c1 >>> 24) - (c0 >>> 24)) & 0xff) << 24 |
      ((((c1 >> 16) & 0xff) - ((c0 >> 16) & 0xff)) & 0xff) << 16 |
      ((((c1 >> 8) & 0xff) - ((c0 >> 8) & 0xff)) & 0xff) << 8 |
      (((c1 & 0xff) - (c0 & 0xff)) & 0xff)
    def chan(p: Int, sh: Int) = (p >>> sh) & 0xff
    def pair(b2: Bits, a: Int, bb: Int): Unit =
      if (a == bb) simple1(b2, a)
      else { // simple 2-symbol listed (a, b): code 0 = a
        b2.put(1, 1).put(1, 1).put(1, 1).put(a, 8).put(bb, 8)
      }
    pair(b, chan(c0, 8), chan(d1, 8))   // green
    pair(b, chan(c0, 16), chan(d1, 16)) // red
    pair(b, chan(c0, 0), chan(d1, 0))   // blue
    pair(b, chan(c0, 24), chan(d1, 24)) // alpha
    simple1(b, 0) // distance
    // palette pixels: entry0 then entry1; for each non-constant channel
    // one bit selects listed symbol (0 -> first)
    def emit(b2: Bits, a: Int, bb: Int, pick: Int): Unit =
      if (a != bb) b2.put(pick, 1)
    // entry 0 picks all-first, entry 1 all-second
    Seq(0, 1).foreach { e =>
      emit(b, chan(c0, 8), chan(d1, 8), e)
      emit(b, chan(c0, 16), chan(d1, 16), e)
      emit(b, chan(c0, 0), chan(d1, 0), e)
      emit(b, chan(c0, 24), chan(d1, 24), e)
    }
    // no more transforms
    b.put(0, 1)
    // main (packed 1×1) image: no cache, no meta; green tree = the packed
    // byte, others constant
    b.put(0, 1)
    b.put(0, 1)
    simple1(b, bitsPattern) // green (packed indices)
    simple1(b, 0); simple1(b, 0); simple1(b, 0xff) // red, blue, alpha
    simple1(b, 0) // distance
    val d = Vp8l.decode(b.toPayload).getOrElse(fail("decode failed"))
    assert(d.width == 8 && d.height == 1)
    val expect = (0 until 8).map(x => if (((bitsPattern >> x) & 1) == 1) c1 else c0)
    assert(d.argb.toSeq == expect)
  }

  test("hand vector: predictor transform border rules (black, L, T) + mode from block") {
    // 2×2, predictor size_bits=2 (blocks of 4 -> one 1×1 mode image).
    // Mode pixel green = 1 (L). Residuals chosen so:
    //  (0,0): res + ARGB(255,0,0,0); (1,0): top row -> L; (0,1): first
    //  col -> T; (1,1): mode 1 -> L.
    val b = new Bits
    header(b, 2, 2)
    b.put(1, 1).put(0, 2) // transform: predictor
    b.put(0, 3) // size_bits - 2 = 0 -> blocks 4
    // mode sub-image 1×1: no cache; green=1 red=blue=0 alpha=255
    b.put(0, 1)
    simple1(b, 1); simple1(b, 0); simple1(b, 0); simple1(b, 255); simple1(b, 0)
    b.put(0, 1) // no more transforms
    b.put(0, 1) // no cache
    b.put(0, 1) // no meta
    // residual channels: greens vary per pixel {10, 1, 2, 3}; reds/blues 0;
    // alphas: (0,0) carries 255 (black pred has alpha 255 -> res 0 keeps
    // 255... choose res alpha 0 everywhere: preds provide 255)
    // greens: 4 distinct -> normal tree over {1,2,3,10}
    writeUniformNormal(b, Array(1, 2, 3, 10), 256 + 24)
    simple1(b, 0) // red residuals
    simple1(b, 0) // blue residuals
    simple1(b, 0) // alpha residuals
    simple1(b, 0) // distance
    // canonical 2-bit codes over ascending symbols {1,2,3,10}
    val code = Map(1 -> 0, 2 -> 1, 3 -> 2, 10 -> 3)
    Seq(10, 1, 2, 3).foreach(g => b.code(code(g), 2))
    val d = Vp8l.decode(b.toPayload).getOrElse(fail("decode failed"))
    def g(i: Int) = (d.argb(i) >> 8) & 0xff
    assert(d.argb.forall(p => (p >>> 24) == 0xff))
    assert(g(0) == 10)          // black pred: green 0 + 10
    assert(g(1) == (10 + 1) % 256)  // L
    assert(g(2) == (10 + 2) % 256)  // T (first column)
    assert(g(3) == (g(2) + 3) % 256) // mode L from block image
  }

  /** normal tree over exactly 2^k ascending symbols, k bits each (uniform
    * complete code); canonical codes are 0..n-1 in symbol order
    */
  private def writeUniformNormal(b: Bits, syms: Array[Int], alphabetSize: Int): Unit = {
    val nbits = syms.length match { case 2 => 1; case 4 => 2; case 8 => 3 }
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    b.put(0, 1)
    b.put(19 - 4, 4)
    val clLen = Map(0 -> 2, nbits -> 2, 18 -> 1)
    order.foreach(s => b.put(clLen.getOrElse(s, 0), 3))
    b.put(0, 1)
    // canonical over {18: len 1, 0: len 2, nbits: len 2}: 18 -> 0;
    // the smaller of {0, nbits} -> 10, the larger -> 11
    val cl = Map(18 -> (0, 1), 0 -> (2, 2), nbits -> (3, 2))
    def clCode(sym: Int): Unit = { val (c, l) = cl(sym); b.code(c, l) }
    def zeros(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (left >= 11) { val take = math.min(left, 138); clCode(18); b.put(take - 11, 7); left -= take }
        else { clCode(0); left -= 1 }
      }
    }
    var prev = -1
    syms.foreach { s => zeros(s - prev - 1); clCode(nbits); prev = s }
    zeros(alphabetSize - prev - 1) // the decoder reads lengths to the END
  }

  test("hand vector: color transform inverse arithmetic") {
    // 1×1 image under a color transform block whose element has
    // green_to_red=2, green_to_blue=3, red_to_blue=251 (-5 as int8).
    // residual (a=255, r=10, g=64, b=20):
    //   r' = 10 + (2*64  >> 5) = 14
    //   b' = 20 + (3*64 >> 5) + (-5 * 14 >> 5) = 20 + 6 - 3 = 23
    // (per-channel int8 arithmetic, >> is arithmetic)
    val b = new Bits
    header(b, 1, 1)
    b.put(1, 1).put(1, 2) // transform: color transform
    b.put(0, 3) // size_bits 2
    // cte sub-image 1×1: pixel blue=g2r=2, green=g2b=3, red=r2b=251
    b.put(0, 1)
    simple1(b, 3)   // green = g2b
    simple1(b, 251) // red = r2b
    simple1(b, 2)   // blue = g2r
    simple1(b, 255) // alpha (ignored)
    simple1(b, 0)
    b.put(0, 1) // no more transforms
    b.put(0, 1).put(0, 1) // no cache, no meta
    simple1(b, 64); simple1(b, 10); simple1(b, 20); simple1(b, 255); simple1(b, 0)
    val d = Vp8l.decode(b.toPayload).getOrElse(fail("decode failed"))
    val p = d.argb(0)
    assert(((p >> 16) & 0xff) == 14, f"r=${(p >> 16) & 0xff}")
    assert((p & 0xff) == 23, f"b=${p & 0xff}")
    assert(((p >> 8) & 0xff) == 64 && (p >>> 24) == 0xff)
  }

  test("distance map: first entries and formula match the spec examples") {
    // plane code 1 -> pixel directly above (dist = width); 2 -> left (1);
    // 3 -> above-left?? no: (1,1) i.e. up-left is dist w+1; 4 -> up-right
    // dist w-1 — pinned through a tiny backref stream each
    def one(code: Int, w: Int): Int = {
      // 3×3 image: 8 literals then one backref of length 1 with plane code
      val b = new Bits
      header(b, 3, 3)
      b.put(0, 1).put(0, 1).put(0, 1)
      // greens: literals 1..8 then length code 256 (length prefix 0 -> 1)
      writeNineSymbolNormal(b)
      simple1(b, 0); simple1(b, 0); simple1(b, 255)
      // distance tree symbol s decodes through prefixValue: s = code - 1
      // for plane codes <= 4 (no extra bits)
      simple1(b, code - 1)
      // canonical over lens {1..7 -> 3 bits, 8 -> 4, 256 -> 4}:
      // 1..7 -> codes 0..6; 8 -> 14; 256 -> 15
      (1 to 7).foreach(g => b.code(g - 1, 3))
      b.code(14, 4) // green 8
      b.code(15, 4) // symbol 256: length code 0
      // length prefix 0 -> value 1, no extra bits; distance symbol is the
      // lone tree (0 bits); plane code `code` -> distance
      val d = Vp8l.decode(b.toPayload).getOrElse(fail(s"decode failed code=$code"))
      (d.argb(8) >> 8) & 0xff // green of the copied pixel
    }
    assert(one(1, 3) == 6) // above: dist 3 -> copies idx 5 (green 6)
    assert(one(2, 3) == 8) // left: dist 1 -> copies idx 7 (green 8)
    assert(one(3, 3) == 5) // up-left: dist 4 -> idx 4 (green 5)
    assert(one(4, 3) == 7) // up-right: dist 2 -> idx 6 (green 7)
  }

  /** normal green tree: symbols 1..8 at 4 bits… plus 256 — lengths chosen
    * complete: eight 4-bit codes + one 4-bit = 9×(1/16) ≠ 1, so use
    * lengths: 1..8 -> 4 bits? Kraft needs Σ2^-l = 1: seven at 3 bits +
    * two at 4 would work, but canonical bookkeeping in the test stays
    * simplest with 8 symbols at 4 bits… instead: symbols 1..7 at 3 bits,
    * 8 and 256 at 4 bits (7/8 + 2/16 = 1). Codes: 1..7 -> 0..6 (3 bits),
    * 8 -> 14, 256 -> 15 (4 bits).
    */
  private def writeNineSymbolNormal(b: Bits): Unit = {
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    b.put(0, 1)
    b.put(19 - 4, 4)
    val clLen = Map(0 -> 3, 3 -> 2, 4 -> 3, 18 -> 1)
    order.foreach(s => b.put(clLen.getOrElse(s, 0), 3))
    b.put(0, 1)
    // canonical over {18:1, 3:2, 0:3, 4:3}: 18 -> 0; 3 -> 10; 0 -> 110; 4 -> 111
    val cl = Map(18 -> (0, 1), 3 -> (2, 2), 0 -> (6, 3), 4 -> (7, 3))
    def clCode(sym: Int): Unit = { val (c, l) = cl(sym); b.code(c, l) }
    def zeros(n: Int): Unit = {
      var left = n
      while (left > 0) {
        if (left >= 11) { val take = math.min(left, 138); clCode(18); b.put(take - 11, 7); left -= take }
        else { clCode(0); left -= 1 }
      }
    }
    zeros(1) // symbol 0
    (1 to 7).foreach(_ => clCode(3))
    clCode(4) // symbol 8
    zeros(256 - 9)
    clCode(4) // symbol 256
    zeros(280 - 257) // fill the green alphabet to the end
  }

  test("hand vector: meta-Huffman routes pixels to per-block tree groups") {
    // 8×1 image, huffman_bits=2 (blocks of 4): the 2×1 meta image maps
    // block 0 -> group 0 and block 1 -> group 1 via (red<<8)|green; the
    // two groups carry different constant literals, so a decoder that
    // ignores routing paints the whole row from group 0
    val b = new Bits
    header(b, 8, 1)
    b.put(0, 1) // no transforms
    b.put(0, 1) // no cache
    b.put(1, 1).put(0, 3) // meta ON, huffman_bits = 0 + 2
    // meta image 2×1 (is_level0=false): green = group index {0, 1}
    b.put(0, 1) // no cache in sub-image
    b.put(1, 1).put(1, 1).put(0, 1).put(0, 1).put(1, 8) // green simple-2: (0, 1)
    simple1(b, 0); simple1(b, 0); simple1(b, 255); simple1(b, 0)
    b.put(0, 1) // meta pixel 0: green 0 -> group 0
    b.put(1, 1) // meta pixel 1: green 1 -> group 1
    // group 0 trees: constant pixel (255, 1, 10, 2)
    simple1(b, 10); simple1(b, 1); simple1(b, 2); simple1(b, 255); simple1(b, 0)
    // group 1 trees: constant pixel (255, 3, 20, 4)
    simple1(b, 20); simple1(b, 3); simple1(b, 4); simple1(b, 255); simple1(b, 0)
    // pixel loop: every tree is 0-bit — routing alone decides the output
    val d = Vp8l.decode(b.toPayload).getOrElse(fail("decode failed"))
    val g0 = 0xff010a02
    val g1 = 0xff031404
    assert(d.argb.toSeq == Seq(g0, g0, g0, g0, g1, g1, g1, g1),
      d.argb.map(_.toHexString).mkString(","))
  }

  test("hand vector: predictor modes 3-13 match an independent reference") {
    // 4×3, predictor blocks of 4 -> ONE mode block covers the image; row 0
    // is forced to L and column 0 to T, so the six interior pixels
    // exercise the block's mode. The expected image is computed by a
    // test-side forward simulation written straight from the spec
    // formulas (avg2 / select / clamp-add-subtract), independent of the
    // decoder's implementation.
    def avg2(a: Int, b2: Int): Int = {
      def c(sh: Int) = ((((a >>> sh) & 0xff) + ((b2 >>> sh) & 0xff)) >> 1) << sh
      c(24) | c(16) | c(8) | c(0)
    }
    def clamp(v: Int) = math.max(0, math.min(255, v))
    def addPx(a: Int, b2: Int): Int = {
      def c(sh: Int) = ((((a >>> sh) & 0xff) + ((b2 >>> sh) & 0xff)) & 0xff) << sh
      c(24) | c(16) | c(8) | c(0)
    }
    def predictRef(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int = mode match {
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
      case 11 =>
        def ch(p: Int, sh: Int) = (p >>> sh) & 0xff
        val shifts = Seq(24, 16, 8, 0)
        val pl = shifts.map(s => math.abs(ch(l, s) + ch(t, s) - ch(tl, s) - ch(l, s))).sum
        val pt = shifts.map(s => math.abs(ch(l, s) + ch(t, s) - ch(tl, s) - ch(t, s))).sum
        if (pl < pt) l else t
      case 12 =>
        def c(sh: Int) = clamp(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff)) << sh
        c(24) | c(16) | c(8) | c(0)
      case 13 =>
        val a = avg2(l, t)
        def c(sh: Int) = {
          val av = (a >>> sh) & 0xff
          clamp(av + (av - ((tl >>> sh) & 0xff)) / 2) << sh
        }
        c(24) | c(16) | c(8) | c(0)
    }
    for (mode <- 3 to 13) {
      val w = 4; val h = 3
      // residual greens {1,2} in a fixed pattern; r/b/alpha residuals 0
      val resG = Array(9, 1, 2, 1, 2, 1, 2, 2, 1, 1, 2, 2)
      val b = new Bits
      header(b, w, h)
      b.put(1, 1).put(0, 2) // predictor transform
      b.put(0, 3) // size_bits = 2 -> blocks of 4 -> 1×1 mode image
      b.put(0, 1) // sub-image: no cache
      simple1(b, mode); simple1(b, 0); simple1(b, 0); simple1(b, 255); simple1(b, 0)
      b.put(0, 1) // no more transforms
      b.put(0, 1).put(0, 1) // no cache, no meta
      writeUniformNormal(b, Array(1, 2, 9, 11), 256 + 24) // greens (11 unused filler)
      simple1(b, 0); simple1(b, 0); simple1(b, 0); simple1(b, 0)
      val gc = Map(1 -> 0, 2 -> 1, 9 -> 2, 11 -> 3)
      resG.foreach(g => b.code(gc(g), 2))
      val d = Vp8l.decode(b.toPayload).getOrElse(fail(s"decode failed mode=$mode"))
      // forward simulation with the same border rules + linear-wrap TR
      val px = new Array[Int](w * h)
      for (i <- 0 until w * h) {
        val x = i % w; val y = i / w
        val m = if (x == 0 && y == 0) 0 else if (y == 0) 1 else if (x == 0) 2 else mode
        val l = if (i > 0) px(i - 1) else 0
        val t = if (i >= w) px(i - w) else 0
        val tl = if (i >= w && x > 0) px(i - w - 1) else 0
        val tr = if (i >= w) px(i - w + 1) else 0
        px(i) = addPx(predictRef(m, l, t, tl, tr), resG(i) << 8)
      }
      assert(d.argb.toSeq == px.toSeq, s"mode=$mode")
    }
  }

  test("hand vector: LZ77 copies re-insert into the color cache") {
    // 2-slot cache. Literals A then C share a slot (C evicts A); a backref
    // then copies A, which must RE-INSERT A (evicting C); the final
    // cache-hit symbol must therefore return A — a decoder that skips
    // insertion during copies returns C.
    def slotOf(p: Int) = (0x1e35a7bd * p) >>> 31
    def pix(g: Int) = 0xff000000 | (g << 8)
    val (ga, gb) = (0 until 256).flatMap(a => (0 until 256).collect {
      case c if c != a && slotOf(pix(a)) == slotOf(pix(c)) => (a, c)
    }).head
    val slot = slotOf(pix(ga))
    val b = new Bits
    header(b, 4, 1)
    b.put(0, 1) // no transforms
    b.put(1, 1).put(1, 4) // cache on, cache_bits = 1
    b.put(0, 1) // no meta
    val syms = Array(ga, gb, 256, 280 + slot).sorted // 256=len-code 1; cache sym
    writeUniformNormal(b, syms, 282)
    simple1(b, 0); simple1(b, 0); simple1(b, 255)
    simple1(b, 4) // distance tree: lone symbol 4 -> plane code 5 or 6 w/ 1 extra bit
    val gc = syms.zipWithIndex.toMap
    b.code(gc(ga), 2) // literal A
    b.code(gc(gb), 2) // literal C (same slot: evicts A)
    b.code(gc(256), 2) // backref, length prefix code 0 -> len 1
    b.put(1, 1) // distance extra bit: prefixValue(4)=4+1+1=6 -> plane 6 -> dist 2
    b.code(gc(280 + slot), 2) // cache hit
    val d = Vp8l.decode(b.toPayload).getOrElse(fail("decode failed"))
    assert(d.argb.toSeq == Seq(pix(ga), pix(gb), pix(ga), pix(ga)),
      d.argb.map(p => (p >> 8) & 0xff).mkString(","))
  }

  test("round-trip pixels feed decodeImageFeatures-equivalent luma math") {
    // mean luma over a decoded fixture equals the closed-form expectation
    val w = 16; val h = 16
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (0xff << 24) | (((x * 7 + y * 13) % 256) << 16) |
        (((x * 3 + y * 5) % 256) << 8) | ((x * 11 + y) % 256)
    }
    val d = Vp8l.decodeWebP(Vp8lEncoder.encode(w, h, px)).get
    val mean = d.argb.map(p =>
      0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)).sum / (w * h)
    val expect = px.map(p =>
      0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)).sum / (w * h)
    assert(math.abs(mean - expect) < 1e-9)
  }
}
