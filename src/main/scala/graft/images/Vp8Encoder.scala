package graft.images

/** Real VP8 lossy keyframe encoder (RFC 6386) — the entropy/bitstream
  * layer that completes [[Vp8Transform]]'s DCT core: boolean-coded
  * frame header, DC_PRED 16×16 macroblocks, Y2 Walsh–Hadamard
  * second-order block, token-tree coefficient coding with the
  * normative probability tables ([[Vp8Tables]]), and a RIFF "VP8 "
  * container. Output is REAL lossy WebP: the system libwebp decodes
  * every committed golden fixture to exactly the pixels this encoder's
  * own reconstruction predicts (Vp8GoldenSpec pins the byte equality;
  * tools/vp8_libwebp_dump.py regenerates the conformance dumps).
  *
  * Scope (stated, not hidden): intra DC_PRED 16×16 only — one mode,
  * no B_PRED sub-modes, no loop filter (level 0), one token partition.
  * That is a complete, conforming VP8 encoder in the fidelity range an
  * ETL re-encode needs; mode search is a rate-distortion OPTIMIZATION,
  * not a conformance requirement (a decoder cannot tell "unsearched"
  * from "searched" streams). Reference behavior:
  * `transformations/webp_transformation.py:14-24` (PIL/libwebp there;
  * pure JVM here, so executors need no native codec).
  *
  * Encoder levels stay inside the decoder-exact envelope by
  * construction: quantized levels come from real residual transforms
  * (|coeff| ≤ ~4080 for 8-bit input), far below the |dequantized| ≈
  * 8000 bound where libwebp's int16 coefficient pipeline was measured
  * to saturate against this implementation's integer model. */
object Vp8Encoder {

  /** Per-plane quantizer steps for a frame qindex (§9.6 defaults, all
    * delta_q = 0): (y1ac, y2dc, y2ac, uvdc, uvac). y1dc is unused —
    * in 16×16 mode every luma DC rides the Y2 block. */
  def quantizers(qindex: Int): (Int, Int, Int, Int, Int) = {
    val qi = math.max(0, math.min(127, qindex))
    val dc = Vp8Tables.DcQLookup(qi)
    val ac = Vp8Tables.AcQLookup(qi)
    (ac, dc * 2, math.max(8, ac * 155 / 100), math.min(dc, 132), ac)
  }

  /** Encoder output plus the bit-exact reconstruction the decoder is
    * guaranteed to produce (the conformance witness the spec checks
    * against libwebp's YUV dump). Planes are padded to the macroblock
    * grid; `w`/`h` give the visible size. `frame` is the raw VP8
    * keyframe before container wrapping — what [[encodeArgbAlpha]]
    * re-wraps into the extended (ALPH) container without re-parsing
    * the simple one. */
  final case class Encoded(webp: Array[Byte],
                           yRec: Array[Int], uRec: Array[Int],
                           vRec: Array[Int], w: Int, h: Int,
                           padW: Int, padH: Int,
                           frame: Array[Byte])

  private def padPlane(src: Array[Int], w: Int, h: Int,
                       pw: Int, ph: Int): Array[Int] = {
    val out = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        out(y * pw + x) = src(sy * w + math.min(x, w - 1))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode YUV420 planes (y: w×h, u/v: ceil(w/2)×ceil(h/2), values
    * 0..255) into a lossy WebP at frame quantizer `qindex` (0 = best,
    * 127 = smallest). */
  def encodeYuv420(ySrc: Array[Int], uSrc: Array[Int], vSrc: Array[Int],
                   w: Int, h: Int, qindex: Int): Encoded = {
    require(w > 0 && h > 0 && w < 16384 && h < 16384,
      s"bad dimensions ${w}x$h")
    val qi = math.max(0, math.min(127, qindex))
    val (y1ac, y2dc, y2ac, uvdc, uvac) = quantizers(qi)
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val pw = mbW * 16; val ph = mbH * 16
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val Y = padPlane(ySrc, w, h, pw, ph)
    val U = padPlane(uSrc, cw, ch, pw / 2, ph / 2)
    val V = padPlane(vSrc, cw, ch, pw / 2, ph / 2)
    val yR = new Array[Int](pw * ph)
    val uR = new Array[Int]((pw / 2) * (ph / 2))
    val vR = new Array[Int]((pw / 2) * (ph / 2))

    val hdr = new Vp8BoolEncoder
    // keyframe header (field order oracle-validated against libwebp)
    hdr.put(0, 128); hdr.put(0, 128) // color space, clamping
    hdr.put(0, 128)                  // segmentation off
    hdr.put(0, 128)                  // filter type
    hdr.literal(0, 6)                // loop filter level 0
    hdr.literal(0, 3)                // sharpness
    hdr.put(0, 128)                  // no lf adjustments
    hdr.literal(0, 2)                // one token partition
    hdr.literal(qi, 7)               // y_ac_qi
    var i = 0
    while (i < 5) { hdr.put(0, 128); i += 1 } // all delta_q absent
    hdr.put(1, 128)                  // refresh entropy probs
    i = 0
    while (i < 1056) {               // keep every default token prob
      hdr.put(0, Vp8Tables.CoeffUpdateProbs(i)); i += 1
    }
    val probSkip = 200
    hdr.put(1, 128)                  // mb_no_coeff_skip enabled
    hdr.literal(probSkip, 8)

    val tok = new Vp8BoolEncoder
    val probs = Vp8Tables.DefaultCoeffProbs
    // nonzero contexts (§13.4): per-subblock column trackers persist
    // across the MB row; per-row trackers reset at each row start
    val yAbove = Array.fill(mbW, 4)(0)
    val y2Above = new Array[Int](mbW)
    val uAbove = Array.fill(mbW, 2)(0)
    val vAbove = Array.fill(mbW, 2)(0)

    @inline def clamp255(x: Int): Int =
      if (x < 0) 0 else if (x > 255) 255 else x

    def dcPredict(plane: Array[Int], stride: Int, px: Int, py: Int,
                  size: Int): Int = {
      val haveA = py > 0; val haveL = px > 0
      if (!haveA && !haveL) return 128
      var s = 0; var n = 0
      if (haveA) {
        var i = 0
        while (i < size) { s += plane((py - 1) * stride + px + i); i += 1 }
        n += size
      }
      if (haveL) {
        var i = 0
        while (i < size) { s += plane((py + i) * stride + px - 1); i += 1 }
        n += size
      }
      val shift = (if (size == 16) 4 else 3) + (if (haveA && haveL) 1 else 0)
      (s + n / 2) >> shift
    }

    // per-MB scratch, hoisted: every cell is overwritten each MB
    // (yLv(b)(0) is never written and stays 0 - luma DC rides Y2), so
    // reuse avoids ~20 short-lived allocations per macroblock
    val yLv = Array.ofDim[Int](16, 16)
    val uLv = Array.ofDim[Int](4, 16)
    val vLv = Array.ofDim[Int](4, 16)
    val y2Coef = new Array[Int](16)
    val block = new Array[Int](16)
    val co = new Array[Int](16)
    var mby = 0
    while (mby < mbH) {
      val yLeft = new Array[Int](4)
      var y2Left = 0
      val uLeft = new Array[Int](2)
      val vLeft = new Array[Int](2)
      var mbx = 0
      while (mbx < mbW) {
        // ---- predict + transform + quantize ----
        val yPred = dcPredict(yR, pw, mbx * 16, mby * 16, 16)
        val uPred = dcPredict(uR, pw / 2, mbx * 8, mby * 8, 8)
        val vPred = dcPredict(vR, pw / 2, mbx * 8, mby * 8, 8)
        var b = 0
        while (b < 16) {
          val br = b / 4; val bc = b % 4
          var j = 0
          while (j < 16) {
            val yy = mby * 16 + br * 4 + j / 4
            val xx = mbx * 16 + bc * 4 + j % 4
            block(j) = Y(yy * pw + xx) - yPred
            j += 1
          }
          val co = Vp8Transform.fdct4x4(block)
          y2Coef(b) = co(0)
          var k = 1
          while (k < 16) {
            yLv(b)(k) = co(k) / y1ac // Scala / truncates toward zero
            k += 1
          }
          b += 1
        }
        val y2w = walsh4x4(y2Coef)
        val y2Lv = Vp8Transform.quantize(y2w, y2dc, y2ac)
        var k = 0
        var pl = 0
        while (pl < 2) {
          val (src, pred, lv) =
            if (pl == 0) (U, uPred, uLv) else (V, vPred, vLv)
          b = 0
          while (b < 4) {
            val br = b / 2; val bc = b % 2
            var j = 0
            while (j < 16) {
              val yy = mby * 8 + br * 4 + j / 4
              val xx = mbx * 8 + bc * 4 + j % 4
              block(j) = src(yy * (pw / 2) + xx) - pred
              j += 1
            }
            val q = Vp8Transform.quantize(
              Vp8Transform.fdct4x4(block), uvdc, uvac)
            System.arraycopy(q, 0, lv(b), 0, 16)
            b += 1
          }
          pl += 1
        }
        var any = false
        k = 0
        while (k < 16 && !any) { any = y2Lv(k) != 0; k += 1 }
        b = 0
        while (b < 16 && !any) {
          k = 1
          while (k < 16 && !any) { any = yLv(b)(k) != 0; k += 1 }
          b += 1
        }
        b = 0
        while (b < 4 && !any) {
          k = 0
          while (k < 16 && !any) {
            any = uLv(b)(k) != 0 || vLv(b)(k) != 0; k += 1
          }
          b += 1
        }
        val skip = !any
        // ---- partition 1: skip flag + modes (DC_PRED everywhere) ----
        hdr.put(if (skip) 1 else 0, probSkip)
        hdr.put(1, Vp8Tables.KfYModeProb(0))
        hdr.put(0, Vp8Tables.KfYModeProb(1))
        hdr.put(0, Vp8Tables.KfYModeProb(2))
        hdr.put(0, Vp8Tables.KfUvModeProb(0))
        // ---- partition 2: tokens (Y2, 16×Y, 4×U, 4×V) ----
        if (!skip) {
          var nz = Vp8Entropy.encodeBlock(tok, probs, y2Lv, 0, 1,
            y2Above(mbx) + y2Left)
          y2Above(mbx) = nz; y2Left = nz
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              nz = Vp8Entropy.encodeBlock(tok, probs, yLv(r * 4 + c), 1, 0,
                yAbove(mbx)(c) + yLeft(r))
              yAbove(mbx)(c) = nz; yLeft(r) = nz
              c += 1
            }
            r += 1
          }
          pl = 0
          while (pl < 2) {
            val (lv, above, left) =
              if (pl == 0) (uLv, uAbove, uLeft) else (vLv, vAbove, vLeft)
            var r2 = 0
            while (r2 < 2) {
              var c2 = 0
              while (c2 < 2) {
                nz = Vp8Entropy.encodeBlock(tok, probs, lv(r2 * 2 + c2),
                  0, 2, above(mbx)(c2) + left(r2))
                above(mbx)(c2) = nz; left(r2) = nz
                c2 += 1
              }
              r2 += 1
            }
            pl += 1
          }
        } else {
          // skipped MB: decoder zeroes every nonzero context (§13.4)
          y2Above(mbx) = 0; y2Left = 0
          java.util.Arrays.fill(yAbove(mbx), 0)
          java.util.Arrays.fill(yLeft, 0)
          java.util.Arrays.fill(uAbove(mbx), 0)
          java.util.Arrays.fill(uLeft, 0)
          java.util.Arrays.fill(vAbove(mbx), 0)
          java.util.Arrays.fill(vLeft, 0)
        }
        // ---- reconstruction (what the decoder will compute) ----
        val dcs = Vp8Transform.invWalsh4x4(
          Vp8Transform.dequantize(y2Lv, y2dc, y2ac))
        b = 0
        while (b < 16) {
          val br = b / 4; val bc = b % 4
          co(0) = dcs(b)
          k = 1
          while (k < 16) { co(k) = yLv(b)(k) * y1ac; k += 1 }
          val res = Vp8Transform.idct4x4(co)
          var j = 0
          while (j < 16) {
            val yy = mby * 16 + br * 4 + j / 4
            val xx = mbx * 16 + bc * 4 + j % 4
            yR(yy * pw + xx) = clamp255(yPred + res(j))
            j += 1
          }
          b += 1
        }
        pl = 0
        while (pl < 2) {
          val (lv, rec, pred) =
            if (pl == 0) (uLv, uR, uPred) else (vLv, vR, vPred)
          b = 0
          while (b < 4) {
            val br = b / 2; val bc = b % 2
            val res = Vp8Transform.idct4x4(
              Vp8Transform.dequantize(lv(b), uvdc, uvac))
            var j = 0
            while (j < 16) {
              val yy = mby * 8 + br * 4 + j / 4
              val xx = mbx * 8 + bc * 4 + j % 4
              rec(yy * (pw / 2) + xx) = clamp255(pred + res(j))
              j += 1
            }
            b += 1
          }
          pl += 1
        }
        mbx += 1
      }
      mby += 1
    }
    val part1 = hdr.stop()
    require(part1.length < (1 << 19),
      s"first partition ${part1.length} B exceeds the frame tag's " +
        "19-bit size field (RFC 6386 \u00a79.1) - the image has too " +
        "many macroblocks for one partition; refuse rather than emit " +
        "a silently corrupt stream")
    val part2raw = tok.stop()
    val part2 = if (part2raw.isEmpty) Array[Byte](0) else part2raw
    val tag = (1 << 4) | (part1.length << 5) // keyframe, ver 0, shown
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff)
    out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    out.write(part1, 0, part1.length)
    out.write(part2, 0, part2.length)
    val frame = out.toByteArray
    Encoded(riffVp8(frame), yR, uR, vR, w, h, pw, ph, frame)
  }

  /** Forward 4×4 Walsh–Hadamard (§14.3's inverse pair partner): packs
    * the 16 luma DC coefficients into the Y2 block. Fidelity-only —
    * the decoder sees levels, so conformance never depends on the
    * forward form (round-trip with [[Vp8Transform.invWalsh4x4]] is
    * within ±1 on the DCT-DC domain, spec-checked). */
  def walsh4x4(b: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = (b(o) + b(o + 2)) * 4; val d1 = (b(o + 1) + b(o + 3)) * 4
      val c1 = (b(o + 1) - b(o + 3)) * 4; val b1 = (b(o) - b(o + 2)) * 4
      tmp(o) = a1 + d1 + (if (a1 != 0) 1 else 0)
      tmp(o + 1) = b1 + c1
      tmp(o + 2) = b1 - c1
      tmp(o + 3) = a1 - d1
      i += 1
    }
    i = 0
    while (i < 4) {
      var a1 = tmp(i) + tmp(8 + i); var d1 = tmp(4 + i) + tmp(12 + i)
      var c1 = tmp(4 + i) - tmp(12 + i); var b1 = tmp(i) - tmp(8 + i)
      var a2 = a1 + d1; var b2 = b1 + c1; var c2 = b1 - c1
      var d2 = a1 - d1
      if (a2 < 0) a2 += 1
      if (b2 < 0) b2 += 1
      if (c2 < 0) c2 += 1
      if (d2 < 0) d2 += 1
      out(i) = (a2 + 3) >> 3; out(4 + i) = (b2 + 3) >> 3
      out(8 + i) = (c2 + 3) >> 3; out(12 + i) = (d2 + 3) >> 3
      i += 1
    }
    out
  }

  private def riffVp8(frame: Array[Byte]): Array[Byte] = {
    val pad = frame.length % 2
    val o = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    o.write("RIFF".getBytes, 0, 4)
    u32(4 + 8 + frame.length + pad)
    o.write("WEBP".getBytes, 0, 4)
    o.write("VP8 ".getBytes, 0, 4)
    u32(frame.length)
    o.write(frame, 0, frame.length)
    if (pad == 1) o.write(0)
    o.toByteArray
  }

  /** EXTENDED WebP container carrying a raw VP8 keyframe plus an
    * UNCOMPRESSED alpha plane — how real lossy WebP preserves
    * transparency (the color channels are lossy VP8; alpha rides in a
    * separate ALPH chunk; WebP container spec "Extended File Format").
    * Chunks: `VP8X` (10-byte payload: flag byte with the alpha bit
    * 0x10 — libwebp's `ALPHA_FLAG` — then 3 reserved zero bytes, then
    * canvas width−1 and height−1 as 24-bit little-endian), `ALPH`
    * (1-byte header `Rsv|P|F|C` all zero = no pre-processing, no
    * filter, no compression, then exactly w×h raw alpha bytes
    * row-major), then the `VP8 ` chunk. Every chunk pads to even
    * length per RIFF. Uncompressed alpha trades bytes for zero new
    * entropy-coder surface; the VP8L-compressed variant (C=1) is a
    * rate optimization, not a capability gap. */
  private def riffVp8x(frame: Array[Byte], alpha: Array[Byte],
                       w: Int, h: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
      o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
    }
    def u24(v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff)
    }
    def chunk(fourcc: String, write: () => Unit, len: Int): Unit = {
      o.write(fourcc.getBytes, 0, 4); u32(len); write()
      if (len % 2 == 1) o.write(0)
    }
    def even(n: Int) = n + (n % 2)
    val alphLen = 1 + alpha.length
    val total = 4 + // "WEBP"
      8 + 10 + // VP8X
      8 + even(alphLen) + // ALPH
      8 + even(frame.length) // VP8
    o.write("RIFF".getBytes, 0, 4); u32(total)
    o.write("WEBP".getBytes, 0, 4)
    chunk("VP8X", () => {
      o.write(0x10) // alpha flag; no ICC/EXIF/XMP/animation
      o.write(0); o.write(0); o.write(0)
      u24(w - 1); u24(h - 1)
    }, 10)
    chunk("ALPH", () => {
      o.write(0) // no pre-processing, no filter, compression=0 (raw)
      o.write(alpha, 0, alpha.length)
    }, alphLen)
    chunk("VP8 ", () => o.write(frame, 0, frame.length), frame.length)
    o.toByteArray
  }

  /** [[encodeArgb]] with the alpha channel PRESERVED: color encodes
    * through the identical lossy VP8 path (same reconstruction
    * witness), alpha losslessly via [[riffVp8x]]'s uncompressed ALPH
    * chunk. Conforming decoders (libwebp `WebPDecodeRGBA`) return the
    * alpha plane byte-exactly. */
  def encodeArgbAlpha(argb: Array[Int], w: Int, h: Int,
                      qindex: Int): Encoded = {
    val base = encodeArgb(argb, w, h, qindex)
    val alpha = new Array[Byte](w * h)
    var i = 0
    while (i < alpha.length) {
      alpha(i) = ((argb(i) >>> 24) & 0xff).toByte; i += 1
    }
    base.copy(webp = riffVp8x(base.frame, alpha, w, h))
  }

  /** BT.601 studio-swing RGB→YUV420 (the WebP/JPEG convention) +
    * encode. `argb` row-major w×h packed ARGB (alpha ignored — real
    * lossy WebP carries alpha in a separate lossless chunk). */
  def encodeArgb(argb: Array[Int], w: Int, h: Int, qindex: Int): Encoded = {
    val y = new Array[Int](w * h)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val u = new Array[Int](cw * ch)
    val v = new Array[Int](cw * ch)
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val p = argb(j * w + i)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
        val b = p & 0xff
        y(j * w + i) = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
        i += 1
      }
      j += 1
    }
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var su = 0; var sv = 0; var n = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val yy = math.min(h - 1, cy * 2 + dy)
            val xx = math.min(w - 1, cx * 2 + dx)
            val p = argb(yy * w + xx)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
            val b = p & 0xff
            su += ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
            sv += ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
            n += 1
            dx += 1
          }
          dy += 1
        }
        u(cy * cw + cx) = (su + n / 2) / n
        v(cy * cw + cx) = (sv + n / 2) / n
        cx += 1
      }
      cy += 1
    }
    encodeYuv420(y, u, v, w, h, qindex)
  }
}
