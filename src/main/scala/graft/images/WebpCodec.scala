package graft.images

import java.awt.image.BufferedImage

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM WebP lossless (VP8L) codec — the real I3 encoder behind
  * `ImageOps.webpEncode` (reference `transformations/webp_transformation
  * .py:7-24`, PIL `img.save(..., lossless=..., quality=...)`). The JDK
  * ships no WebP codec and the build has no external deps, so the
  * bitstream is produced directly against the public "WebP Lossless
  * Bitstream Specification" (VP8L).
  *
  * Encoder output layout (spec-valid, accepted by any conforming VP8L
  * decoder):
  *  - RIFF/WEBP container with a single VP8L chunk;
  *  - no transforms, no color cache, no meta prefix codes;
  *  - one prefix-code group: green/red/blue/alpha each use the complete
  *    canonical code "all 256 byte values at length 8" (Kraft-exact, so
  *    code(symbol) == symbol), the 24 length prefixes get length 0 via a
  *    single repeat-zero op, the distance code is a 1-symbol simple code;
  *  - every pixel is then 32 literal-coded bits (G,R,B,A code order).
  *  No entropy modeling is attempted: the goal is a correct, decodable
  *  lossless stream (≈4 B/px), not rate competitiveness with libwebp.
  *  Validated against the canonical decoder: libwebp's `WebPDecodeRGBA`
  *  reproduces this encoder's output pixel-exactly (RGB and ARGB, even
  *  and odd payload sizes). The evidence is committed: the `.webp` files
  *  under `src/test/resources/golden/webp/` are this encoder's outputs
  *  and the sibling `.rgba` files their libwebp decodes
  *  (`tools/webp_libwebp_dump.py`); `GoldenWebpSpec` re-checks both
  *  directions on every test run.
  *
  * The decoder reads the general literal subset of the spec — arbitrary
  * simple/normal prefix codes (incl. 16/17/18 repeats and the max_symbol
  * escape) and color-cache symbols — and rejects streams using
  * transforms, meta prefix codes, or LZ77 backward references with
  * UnsupportedOperationException. That subset is a strict superset of
  * what the encoder emits, so encode→decode round-trips bit-exactly.
  */
object WebpCodec {

  private val MaxDim = 1 << 14 // 14-bit width-1/height-1 fields

  /** kCodeLengthCodeOrder from the spec: storage order of the 3-bit
    * code-length-code lengths. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ------------------------------------------------------------ writer

  /** VP8L bitstream writer: bits are packed LSB-first into each byte;
    * prefix (huffman) codes are appended MSB-of-code-first. */
  private final class BitWriter {
    private val out = new ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def writeBits(value: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((value >>> i) & 1) << n
        n += 1
        if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >>> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (n > 0) { out += cur.toByte; cur = 0; n = 0 }
      out.toArray
    }
  }

  /** Emit a normal (non-simple) prefix code whose first 256 symbols all
    * have length 8 and whose remaining `alphabet - 256` symbols are
    * unused (length 0). The code-length code uses two 1-bit symbols
    * ({8 → 0, 18 → 1}); 256 literal "8"s then one repeat-zero op. */
  private def writeFixed8Code(w: BitWriter, alphabet: Int): Unit = {
    w.writeBits(0, 1) // normal code
    // code-length-code lengths: symbols 18 (order idx 1) and 8 (idx 11)
    // get length 1, everything else 0 → store 12 entries
    w.writeBits(12 - 4, 4)
    var i = 0
    while (i < 12) {
      val len = if (ClOrder(i) == 8 || ClOrder(i) == 18) 1 else 0
      w.writeBits(len, 3)
      i += 1
    }
    w.writeBits(0, 1) // no max_symbol escape: read full alphabet
    // canonical 1-bit cl-code: symbol 8 → '0', symbol 18 → '1'
    i = 0
    while (i < 256) { w.writeCode(0, 1); i += 1 }
    if (alphabet > 256) {
      val zeros = alphabet - 256 // 24 (green) — inside 18's 11..138 range
      w.writeCode(1, 1)
      w.writeBits(zeros - 11, 7)
    }
  }

  /** Encode ARGB pixels as a spec-valid lossless VP8L/WebP byte array.
    * Fails (None) only on dimensions beyond the 14-bit field limit. */
  def encodeLossless(img: BufferedImage): Option[Array[Byte]] = {
    val (wpx, hpx) = (img.getWidth, img.getHeight)
    if (wpx < 1 || hpx < 1 || wpx > MaxDim || hpx > MaxDim) return None
    val px = img.getRGB(0, 0, wpx, hpx, null, 0, wpx)
    var hasAlpha = false
    var i = 0
    while (i < px.length && !hasAlpha) {
      if ((px(i) >>> 24) != 0xff) hasAlpha = true
      i += 1
    }
    val w = new BitWriter
    w.writeBits(0x2f, 8) // VP8L signature
    w.writeBits(wpx - 1, 14)
    w.writeBits(hpx - 1, 14)
    w.writeBits(if (hasAlpha) 1 else 0, 1)
    w.writeBits(0, 3) // version
    w.writeBits(0, 1) // no transforms
    w.writeBits(0, 1) // no color cache
    w.writeBits(0, 1) // no meta prefix codes
    writeFixed8Code(w, 256 + 24) // green + length prefixes
    writeFixed8Code(w, 256) // red
    writeFixed8Code(w, 256) // blue
    writeFixed8Code(w, 256) // alpha
    // distance: 1-symbol simple code (0 bits/use; never used — no LZ77)
    w.writeBits(1, 1); w.writeBits(0, 1); w.writeBits(0, 1); w.writeBits(0, 1)
    i = 0
    while (i < px.length) {
      val p = px(i)
      w.writeCode((p >>> 8) & 0xff, 8) // green
      w.writeCode((p >>> 16) & 0xff, 8) // red
      w.writeCode(p & 0xff, 8) // blue
      w.writeCode(p >>> 24, 8) // alpha
      i += 1
    }
    val payload = w.toBytes
    Some(riffWrap(payload))
  }

  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffWrap(vp8l: Array[Byte]): Array[Byte] = {
    val pad = vp8l.length % 2 // RIFF chunks are even-padded
    val riffSize = 4 + 8 + vp8l.length + pad
    "RIFF".getBytes("US-ASCII") ++ u32le(riffSize) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8L".getBytes("US-ASCII") ++
      u32le(vp8l.length) ++ vp8l ++ Array.fill[Byte](pad)(0)
  }

  // ------------------------------------------------------------ reader

  private final class BitReader(bytes: Array[Byte], private var pos: Int) {
    private var bit = 0
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= bytes.length)
          throw new IllegalArgumentException("truncated VP8L stream")
        v |= ((bytes(pos) >> bit) & 1) << i
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  /** Canonical prefix decoder built from code lengths (RFC1951-style
    * canonical assignment, as the spec mandates). A code with exactly one
    * used symbol is a 0-bit code (spec: "simple" degenerate case). */
  private final class PrefixCode(lengths: Array[Int]) {
    private val used = lengths.count(_ > 0)
    private val single = if (used == 1) lengths.indexWhere(_ > 0) else -1
    private val maxLen = if (used <= 1) 0 else lengths.max
    private val blCount = new Array[Int](maxLen + 1)
    // symbols sorted by (code length, symbol value) — canonical order
    private val sorted: Array[Int] =
      if (used <= 1) Array.emptyIntArray
      else {
        lengths.foreach(l => if (l > 0) blCount(l) += 1)
        var kraft = 0L
        var l = 1
        while (l <= maxLen) {
          kraft += blCount(l).toLong << (maxLen - l); l += 1
        }
        require(kraft == (1L << maxLen),
          s"incomplete/oversubscribed prefix code (kraft=$kraft/${1L << maxLen})")
        val next = new Array[Int](maxLen + 1)
        var t = 0
        l = 1
        while (l <= maxLen) { next(l) = t; t += blCount(l); l += 1 }
        val syms = new Array[Int](used)
        var s = 0
        while (s < lengths.length) {
          val ln = lengths(s)
          if (ln > 0) { syms(next(ln)) = s; next(ln) += 1 }
          s += 1
        }
        syms
      }
    def read(r: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= maxLen) {
        code = (code << 1) | r.readBits(1)
        val count = blCount(len)
        if (code - first < count) return sorted(index + (code - first))
        index += count
        first = (first + count) << 1
        len += 1
      }
      throw new IllegalArgumentException("invalid prefix code read")
    }
  }

  /** Read one prefix code (simple or normal, incl. repeats/max_symbol)
    * for the given alphabet size. */
  private def readPrefixCode(r: BitReader, alphabet: Int): PrefixCode = {
    val lengths = new Array[Int](alphabet)
    if (r.readBits(1) == 1) { // simple
      val numSymbols = r.readBits(1) + 1
      val first8 = r.readBits(1)
      val s0 = r.readBits(if (first8 == 1) 8 else 1)
      lengths(s0) = 1 // one symbol → 0-bit code via the `single` path
      if (numSymbols == 2) lengths(r.readBits(8)) = 1
      new PrefixCode(lengths)
    } else {
      val numCl = r.readBits(4) + 4
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = r.readBits(3); i += 1 }
      val clCode = new PrefixCode(clLengths)
      val maxSymbol =
        if (r.readBits(1) == 1) {
          val nbits = 2 + 2 * r.readBits(3)
          2 + r.readBits(nbits)
        } else alphabet
      var sym = 0
      var budget = maxSymbol
      var prev = 8
      while (sym < alphabet && budget > 0) {
        budget -= 1
        val cl = clCode.read(r)
        if (cl < 16) {
          lengths(sym) = cl; sym += 1
          if (cl != 0) prev = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + r.readBits(2), prev)
            case 17 => (3 + r.readBits(3), 0)
            case _ => (11 + r.readBits(7), 0)
          }
          var j = 0
          while (j < repeat && sym < alphabet) {
            lengths(sym) = value; sym += 1; j += 1
          }
        }
      }
      new PrefixCode(lengths)
    }
  }

  /** Decode a VP8L/WebP byte array produced by [[encodeLossless]] (or any
    * literal-only lossless stream) to ARGB. Throws IllegalArgumentException
    * on malformed input, UnsupportedOperationException on spec features
    * outside the literal subset (transforms, meta codes, LZ77 refs). */
  def decode(bytes: Array[Byte]): BufferedImage = {
    require(bytes.length > 20 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WEBP", "not a RIFF/WEBP file")
    // walk chunks for VP8L
    var p = 12
    var vp8lStart = -1
    var vp8lLen = -1
    while (p + 8 <= bytes.length && vp8lStart < 0) {
      val tag = new String(bytes, p, 4, "US-ASCII")
      val len = (bytes(p + 4) & 0xff) | ((bytes(p + 5) & 0xff) << 8) |
        ((bytes(p + 6) & 0xff) << 16) | ((bytes(p + 7) & 0xff) << 24)
      if (tag == "VP8L") { vp8lStart = p + 8; vp8lLen = len }
      else p += 8 + len + (len % 2)
    }
    require(vp8lStart >= 0, "no VP8L chunk (lossy/extended WebP?)")
    val r = new BitReader(bytes, vp8lStart)
    require(r.readBits(8) == 0x2f, "bad VP8L signature")
    val w = r.readBits(14) + 1
    val h = r.readBits(14) + 1
    r.readBits(1) // alpha hint
    require(r.readBits(3) == 0, "unknown VP8L version")
    if (r.readBits(1) == 1)
      throw new UnsupportedOperationException("VP8L transforms")
    val cacheBits = if (r.readBits(1) == 1) r.readBits(4) else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    if (r.readBits(1) == 1)
      throw new UnsupportedOperationException("meta prefix codes")
    val green = readPrefixCode(r, 256 + 24 + cacheSize)
    val red = readPrefixCode(r, 256)
    val blue = readPrefixCode(r, 256)
    val alpha = readPrefixCode(r, 256)
    readPrefixCode(r, 40) // distance code (unused in literal subset)
    val cache = new Array[Int](math.max(cacheSize, 1))
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      val g = green.read(r)
      if (g < 256) {
        val rr = red.read(r); val b = blue.read(r); val a = alpha.read(r)
        val argb = (a << 24) | (rr << 16) | (g << 8) | b
        px(i) = argb
        if (cacheSize > 0)
          cache(((0x1e35a7bd * argb) >>> (32 - cacheBits)).toInt) = argb
        i += 1
      } else if (g < 256 + 24) {
        throw new UnsupportedOperationException("LZ77 backward reference")
      } else {
        px(i) = cache(g - 256 - 24)
        i += 1
      }
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }
}
