package graft.images

/** The REAL VP8 4×4 transform pair (RFC 6386 §14.3) and transform-
  * domain quantization — the DCT layer of WebP's lossy path, exact
  * integer arithmetic, no floats anywhere.
  *
  * Forward transform: libwebp's integer formulation (`FTransform`,
  * constants 2217/5352 with the 1812/937/12000/51000 rounders) —
  * the canonical encoder-side pair of the RFC's inverse. Inverse
  * transform: RFC 6386's fixed-point butterflies with
  * cospi8sqrt2minus1 = 20091 and sinpi8sqrt2 = 35468 (>>16), final
  * (x + 4) >> 3 descale. The pair is designed to round-trip residuals
  * in [−255, 255] with at most ±1 reconstruction error
  * (property-tested over generated blocks in Vp8TransformSpec — the
  * bound is the pair's documented fixed-point contract, not an
  * approximation we accept silently).
  *
  * Quantization is the VP8 shape: position 0 (DC) divides by `qdc`,
  * the 15 AC positions by `qac`; dequantization multiplies back.
  * The entropy layer ABOVE this file — qindex→step lookups,
  * probability tables, boolean arithmetic coder, token trees — lives
  * in [[Vp8Tables]]/[[Vp8Entropy]]/[[Vp8Encoder]] (r19): the system
  * libwebp turned out to be a conformance oracle, so the full real
  * VP8 bitstream now exists and is golden-fixture-pinned
  * (FIXTURES.md §1.9, Vp8GoldenSpec). This file stays the shared
  * transform core; `vp8dct` mode ([[ImageOps.webpEncodeDct]]) remains
  * as the transform-only tier inside a lossless container. */
object Vp8Transform {

  /** Forward 4×4 transform of a residual block (row-major, values in
    * [−255, 255]); output: 16 coefficients, DC at index 0. */
  def fdct4x4(in: Array[Int]): Array[Int] = {
    require(in.length == 16, "block must be 4x4")
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val d0 = in(o); val d1 = in(o + 1); val d2 = in(o + 2)
      val d3 = in(o + 3)
      val a0 = d0 + d3; val a1 = d1 + d2; val a2 = d1 - d2
      val a3 = d0 - d3
      tmp(o) = (a0 + a1) * 8
      tmp(o + 1) = (a2 * 2217 + a3 * 5352 + 1812) >> 9
      tmp(o + 2) = (a0 - a1) * 8
      tmp(o + 3) = (a3 * 2217 - a2 * 5352 + 937) >> 9
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val a0 = tmp(i) + tmp(12 + i); val a1 = tmp(4 + i) + tmp(8 + i)
      val a2 = tmp(4 + i) - tmp(8 + i); val a3 = tmp(i) - tmp(12 + i)
      out(i) = (a0 + a1 + 7) >> 4
      out(4 + i) = ((a2 * 2217 + a3 * 5352 + 12000) >> 16) +
        (if (a3 != 0) 1 else 0)
      out(8 + i) = (a0 - a1 + 7) >> 4
      out(12 + i) = (a3 * 2217 - a2 * 5352 + 51000) >> 16
      i += 1
    }
    out
  }

  @inline private def mul1(a: Int): Int = ((a * 20091) >> 16) + a
  @inline private def mul2(a: Int): Int = (a * 35468) >> 16

  /** Inverse 4×4 transform (RFC 6386 §14.3): coefficients →
    * reconstructed residuals. */
  def idct4x4(in: Array[Int]): Array[Int] = {
    require(in.length == 16, "block must be 4x4")
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // vertical pass over columns
      val a = in(i) + in(8 + i)
      val b = in(i) - in(8 + i)
      val c = mul2(in(4 + i)) - mul1(in(12 + i))
      val d = mul1(in(4 + i)) + mul2(in(12 + i))
      tmp(i) = a + d
      tmp(4 + i) = b + c
      tmp(8 + i) = b - c
      tmp(12 + i) = a - d
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // horizontal pass over rows, with descale
      val o = i * 4
      val dc = tmp(o) + 4
      val a = dc + tmp(o + 2)
      val b = dc - tmp(o + 2)
      val c = mul2(tmp(o + 1)) - mul1(tmp(o + 3))
      val d = mul1(tmp(o + 1)) + mul2(tmp(o + 3))
      out(o) = (a + d) >> 3
      out(o + 1) = (b + c) >> 3
      out(o + 2) = (b - c) >> 3
      out(o + 3) = (a - d) >> 3
      i += 1
    }
    out
  }

  /** Inverse 4×4 Walsh–Hadamard transform (§14.3) — distributes the
    * Y2 block's second-order coefficients back onto the 16 luma DCs
    * of a 16×16-mode macroblock. Exact integer form; conformance
    * pinned by the lossy golden fixtures (libwebp reproduces the
    * reconstruction pixel-exactly — Vp8GoldenSpec). */
  def invWalsh4x4(c: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = c(i) + c(12 + i); val b1 = c(4 + i) + c(8 + i)
      val c1 = c(4 + i) - c(8 + i); val d1 = c(i) - c(12 + i)
      tmp(i) = a1 + b1; tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1; tmp(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3); val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2); val d1 = tmp(o) - tmp(o + 3)
      out(o) = (a1 + b1 + 3) >> 3; out(o + 1) = (c1 + d1 + 3) >> 3
      out(o + 2) = (a1 - b1 + 3) >> 3; out(o + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    out
  }

  /** VP8-shaped quantization: DC by `qdc`, AC by `qac`; truncating
    * division toward zero (the RFC's level semantics). */
  def quantize(coeffs: Array[Int], qdc: Int, qac: Int): Array[Int] = {
    require(qdc >= 1 && qac >= 1, "quantizers must be >= 1")
    val out = new Array[Int](16)
    var i = 0
    while (i < 16) {
      val q = if (i == 0) qdc else qac
      out(i) = coeffs(i) / q // Scala / truncates toward zero
      i += 1
    }
    out
  }

  /** Dequantize levels back to coefficients. */
  def dequantize(levels: Array[Int], qdc: Int, qac: Int): Array[Int] = {
    val out = new Array[Int](16)
    var i = 0
    while (i < 16) {
      out(i) = levels(i) * (if (i == 0) qdc else qac)
      i += 1
    }
    out
  }

  /** One channel plane through the full lossy loop: per 4×4 block
    * (edge-replicated padding), residual vs 128 → [[fdct4x4]] →
    * [[quantize]] → [[dequantize]] → [[idct4x4]] → +128, clamped.
    * `plane` is row-major w×h with values 0..255; returns the
    * reconstructed plane. */
  def quantizePlane(plane: Array[Int], w: Int, h: Int,
                    qdc: Int, qac: Int): Array[Int] = {
    require(plane.length == w * h, "plane size mismatch")
    val out = new Array[Int](w * h)
    val block = new Array[Int](16)
    var by = 0
    while (by < h) {
      var bx = 0
      while (bx < w) {
        var k = 0
        while (k < 16) {
          val x = math.min(bx + (k & 3), w - 1)
          val y = math.min(by + (k >> 2), h - 1)
          block(k) = plane(y * w + x) - 128
          k += 1
        }
        val rec = idct4x4(dequantize(
          quantize(fdct4x4(block), qdc, qac), qdc, qac))
        k = 0
        while (k < 16) {
          val x = bx + (k & 3); val y = by + (k >> 2)
          if (x < w && y < h)
            out(y * w + x) = math.max(0, math.min(255, rec(k) + 128))
          k += 1
        }
        bx += 4
      }
      by += 4
    }
    out
  }
}
