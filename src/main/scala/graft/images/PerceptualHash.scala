package graft.images

import java.awt.image.BufferedImage

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 64-bit perceptual difference hash (dHash) for image near-duplicate
  * detection — the missing payload-side twin of the text dedup family:
  * the reference pipeline decodes/resizes/re-encodes images
  * (`transformations/resize_transformation.py:6-16`,
  * `webp_transformation.py:7-24`) but a WikiCaps-scale corpus also
  * carries the SAME image under different filenames and re-encodes;
  * dHash (a 9×8 grayscale gradient-sign hash) is invariant to
  * re-encoding, uniform brightness shift, and resampling, so
  * Hamming-near hashes flag perceptual duplicates.
  *
  * The hash is fully specified by this file — no JDK rendering path is
  * involved, so values are bit-stable across JVMs/platforms and safe to
  * persist in a signature store:
  *
  *  1. integer luma per pixel: `299·R + 587·G + 114·B` (×1000 fixed
  *     point, ITU-R BT.601 weights; alpha ignored);
  *  2. exact area-average onto a 9×8 grid: cell (r,c) covers source
  *     columns `[c·W/9, (c+1)·W/9)` × rows `[r·H/8, (r+1)·H/8)` (integer
  *     floor bounds). Images narrower than 9 or shorter than 8 are first
  *     pixel-replicated up to size — replication leaves every cell
  *     average unchanged, keeping the map total;
  *  3. bit `i = r·8 + c` (LSB-first, row-major) is set iff cell (r,c)'s
  *     average luma is STRICTLY greater than cell (r,c+1)'s. The compare
  *     is the exact cross-product `sumL·areaR > sumR·areaL` — no
  *     division, no rounding — evaluated in 128 bits via
  *     `Math.multiplyHigh`, so it is exact for EVERY decodable image
  *     (a 64-bit product would overflow past ~4.3e8 total pixels:
  *     sums reach 255000·area and area ~ W·H/72).
  *
  * Uniform brightness change adds a constant to every luma value, which
  * preserves every strict inequality — the hash is exactly invariant
  * (spec-proven), not just approximately. Scaling by pixel replication
  * is hash-invariant when the grid divides the source dimensions
  * (9 | W and 8 | H): cell boundaries then land on replication-block
  * edges and every cell average is unchanged. For other dimensions the
  * integer floor boundaries `⌊c·kW/9⌋` shift relative to `k·⌊c·W/9⌋`,
  * so a replicated upscale is only NEAR-invariant (boundary rows/
  * columns migrate between cells). Horizontal flips and crops
  * change gradient signs → large Hamming distance (dHash is a content
  * hash, not a geometric-invariant descriptor).
  *
  * Scale: the hash is a map-only scalar per image (one decode — the
  * expensive part — plus O(W·H) integer work), carried as a LONG column;
  * near-dup search over hashes is [[graft.dedup.Dedup.imageNearDupPairs]]
  * (Hamming-band LSH, never all-pairs).
  */
object PerceptualHash {

  /** dHash of a decoded image; deterministic pure function (see object
    * doc for the exact definition). */
  def dHash64(img: BufferedImage): Long = {
    val w0 = img.getWidth
    val h0 = img.getHeight
    // luma plane at fixed-point ×1000; tiny images pixel-replicated so
    // every grid cell is non-empty (replication preserves averages)
    val kx = if (w0 >= 9) 1 else (9 + w0 - 1) / w0
    val ky = if (h0 >= 8) 1 else (8 + h0 - 1) / h0
    val w = w0 * kx
    val h = h0 * ky
    val rgb = img.getRGB(0, 0, w0, h0, null, 0, w0)
    val luma = new Array[Long](w * h)
    var y = 0
    while (y < h) {
      val srcRow = (y / ky) * w0
      var x = 0
      while (x < w) {
        val p = rgb(srcRow + x / kx)
        luma(y * w + x) =
          299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) +
            114L * (p & 0xff)
        x += 1
      }
      y += 1
    }
    // exact integer cell sums over the 9×8 grid
    val sum = Array.ofDim[Long](8, 9)
    val area = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8; val y1 = (r + 1) * h / 8
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9; val x1 = (c + 1) * w / 9
        var s = 0L
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) { s += luma(yy * w + xx); xx += 1 }
          yy += 1
        }
        sum(r)(c) = s
        area(r)(c) = (x1 - x0).toLong * (y1 - y0)
        c += 1
      }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        // avg(r,c) > avg(r,c+1) via exact 128-bit cross-multiplication
        if (gtProduct(sum(r)(c), area(r)(c + 1), sum(r)(c + 1), area(r)(c)))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** `a·b > c·d` for NON-NEGATIVE longs, exact in 128 bits: high words
    * via `Math.multiplyHigh`, low words compared unsigned. A plain
    * 64-bit product overflows once total pixels pass ~4.3e8
    * (sum ≤ 255000·area, area ~ W·H/72), silently flipping hash bits
    * on very large images — a correctness hazard for a PERSISTED
    * signature format, so the compare is overflow-proof instead of
    * bound-documented. */
  private[images] def gtProduct(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /** dHash over an opaque binary image column → nullable LONG (null on
    * null/undecodable payload — the R4 never-throw contract). A UDF is
    * the right tool here, as for the other image ops: the work is a
    * binary decode, not an expression Catalyst could codegen. */
  def dHashCol(data: Column): Column = {
    val f = udf((bytes: Array[Byte]) =>
      if (bytes == null) None
      else ImageOps.decode(bytes).map(dHash64))
    f(data)
  }

  /** Hamming distance between two 64-bit hash columns:
    * `bit_count(a XOR b)` — codegen'd, no UDF. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The four 16-bit LSH bands of a hash column, LSB-first: band b =
    * `(hash >> 16b) & 0xFFFF` (arithmetic shift + mask — exact for the
    * sign-bit band too). Two hashes within Hamming distance 3 share at
    * least one band exactly (pigeonhole over 4 bands). */
  def bands(hash: Column): Seq[Column] =
    (0 until 4).map(b => shiftright(hash, 16 * b).bitwiseAND(lit(0xffffL)))
}
