package graft.images

import scala.collection.mutable.ArrayBuffer

/** RFC 6386 boolean arithmetic coder (encoder side) — the entropy
  * layer under every VP8 keyframe field. Probability `p` ∈ 1..255 is
  * P(bit = 0)·256; the split arithmetic, carry propagation, and the
  * 32-zero-bit flush are the normative algorithm (§7). Conformance is
  * pinned end-to-end by the golden fixtures (libwebp decodes our
  * frames pixel-exactly — Vp8GoldenSpec), not merely by round-trip.
  *
  * Reference behavior: `transformations/webp_transformation.py:14-24`
  * (the reference's lossy path delegates to PIL/libwebp; this file is
  * the pure-JVM equivalent of the entropy layer it gets for free). */
final class Vp8BoolEncoder {
  private var low = 0L
  private var range = 255
  private var count = -24
  private val buf = ArrayBuffer.empty[Byte]

  def put(bit: Int, prob: Int): Unit = {
    val split = 1 + (((range - 1) * prob) >> 8)
    if (bit != 0) {
      low += split
      range -= split
    } else range = split
    var shift = Integer.numberOfLeadingZeros(range) - 24
    range <<= shift
    count += shift
    if (count >= 0) {
      val offset = shift - count
      if (((low << (offset - 1)) & 0x80000000L) != 0) {
        // carry: propagate through any 0xff run in the output
        var x = buf.length - 1
        while (x >= 0 && buf(x) == -1) { buf(x) = 0; x -= 1 }
        buf(x) = (buf(x) + 1).toByte
      }
      buf += ((low >> (24 - offset)) & 0xff).toByte
      low = (low << offset) & 0xffffff
      shift = count
      count -= 8
    }
    low = (low << shift) & 0xffffffffL
  }

  /** MSB-first fixed-width literal (probability-128 bits, §9). */
  def literal(v: Int, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { put((v >> i) & 1, 128); i -= 1 }
  }

  /** Flush: 32 zero bits, per the normative stop procedure. */
  def stop(): Array[Byte] = {
    var i = 0
    while (i < 32) { put(0, 128); i += 1 }
    buf.toArray
  }
}

/** Token-layer encoder for one DCT block (§13): tokenizes quantized
  * levels in zigzag order through the 11-node coefficient tree with
  * band/context-selected probabilities, large values via the six
  * extra-bit categories, sign as a probability-128 bit, and the
  * "no EOB directly after a ZERO token" tree-entry rule. */
object Vp8Entropy {

  /** Coefficient tree as (bit, probIndex) paths per token id
    * 0=EOB 1=ZERO 2=ONE 3=TWO 4=THREE 5=FOUR 6..11=CAT1..6. */
  val TokenPaths: Array[Array[(Int, Int)]] = {
    // tree: {-EOB,2, -ZERO,4, -ONE,6, 8,12, -TWO,10, -THREE,-FOUR,
    //        14,16, -CAT1,-CAT2, 18,20, -CAT3,-CAT4, -CAT5,-CAT6}
    val tree = Array(-1, 2, -2, 4, -3, 6, 8, 12, -4, 10, -5, -6,
      14, 16, -7, -8, 18, 20, -9, -10, -11, -12)
    val out = new Array[Array[(Int, Int)]](12)
    def walk(idx: Int, path: List[(Int, Int)]): Unit = {
      var bit = 0
      while (bit <= 1) {
        val t = tree(idx + bit)
        val np = (bit, idx / 2) :: path
        if (t <= 0) out(-t - 1) = np.reverse.toArray
        else walk(t, np)
        bit += 1
      }
    }
    walk(0, Nil)
    out
  }

  /** Token id for an absolute level (1..2114). */
  def tokenFor(av: Int): (Int, Int) = {
    if (av <= 4) (av + 1, 0) // ZERO..FOUR are ids 1..5
    else {
      var c = 0
      while (c < 6) {
        val base = Vp8Tables.CatBase(c)
        val bits = Vp8Tables.CatProbs(c).length
        if (av < base + (1 << bits)) return (6 + c, av - base)
        c += 1
      }
      throw new IllegalArgumentException(
        s"level $av exceeds VP8 category 6 range")
    }
  }

  /** Encode one block's levels (natural order, 16 ints). `first` = 0
    * (Y2/chroma) or 1 (luma in a 16×16-mode MB, DC lives in Y2);
    * `typ` selects the probability plane (0 = Y-after-Y2, 1 = Y2,
    * 2 = chroma); `ctx0` = above+left nonzero context. `probs` is the
    * flattened [4][8][3][11] table in effect for this frame.
    * Returns 1 if the block has any nonzero level. */
  def encodeBlock(e: Vp8BoolEncoder, probs: Array[Int], levels: Array[Int],
                  first: Int, typ: Int, ctx0: Int): Int = {
    val zz = Vp8Tables.Zigzag
    var last = -1
    var i = first
    while (i < 16) { if (levels(zz(i)) != 0) last = i; i += 1 }
    @inline def probBase(pos: Int, ctx: Int): Int =
      ((typ * 8 + Vp8Tables.CoeffBands(pos)) * 3 + ctx) * 11
    if (last < 0) {
      val pb = probBase(first, ctx0)
      val path = TokenPaths(0)
      var j = 0
      while (j < path.length) {
        e.put(path(j)._1, probs(pb + path(j)._2)); j += 1
      }
      return 0
    }
    var ctx = ctx0
    var prevZero = false
    var n = first
    while (n <= last) {
      val v = levels(zz(n))
      val av = math.abs(v)
      val (tok, extra) = tokenFor(av)
      val pb = probBase(n, ctx)
      val path = TokenPaths(tok)
      var j = if (prevZero) 1 else 0 // EOB branch unreachable after ZERO
      while (j < path.length) {
        e.put(path(j)._1, probs(pb + path(j)._2)); j += 1
      }
      if (tok >= 6) {
        val cp = Vp8Tables.CatProbs(tok - 6)
        var b = 0
        while (b < cp.length) {
          e.put((extra >> (cp.length - 1 - b)) & 1, cp(b)); b += 1
        }
      }
      if (av != 0) e.put(if (v < 0) 1 else 0, 128) // sign
      ctx = if (av == 0) 0 else if (av == 1) 1 else 2
      prevZero = av == 0
      n += 1
    }
    if (n < 16) { // explicit EOB (previous token was nonzero)
      val pb = probBase(n, ctx)
      val path = TokenPaths(0)
      var j = 0
      while (j < path.length) {
        e.put(path(j)._1, probs(pb + path(j)._2)); j += 1
      }
    }
    1
  }
}
