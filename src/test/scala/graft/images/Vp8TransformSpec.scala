package graft.images

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class Vp8TransformSpec extends AnyFunSuite with Matchers {
  import Vp8Transform._

  test("transform pair round-trips arbitrary residual blocks within " +
    "the fixed-point contract (±1) — 20k generated blocks") {
    val rng = new scala.util.Random(1)
    var maxErr = 0
    (0 until 20000).foreach { _ =>
      val in = Array.fill(16)(rng.nextInt(511) - 255)
      val out = idct4x4(fdct4x4(in))
      maxErr = math.max(maxErr,
        in.zip(out).map { case (a, b) => math.abs(a - b) }.max)
    }
    maxErr should be <= 1
  }

  test("energy compaction: a flat block is DC plus sub-step rounding " +
    "bias (AC ≤ 1, zeroed by any real quantizer); a horizontal " +
    "gradient concentrates in the first coefficient row") {
    val flat = fdct4x4(Array.fill(16)(37))
    flat(0) should not be 0
    // the forward pass's +1812/+12000 rounders leave |AC| ≤ 1 on flat
    // input (the libwebp formulation's documented bias) — below the
    // smallest VP8 step, so quantization always zeroes it
    flat.drop(1).foreach(c => math.abs(c) should be <= 1)
    quantize(flat, 4, 4).drop(1).foreach(_ shouldBe 0)
    val grad = fdct4x4(Array.tabulate(16)(k => (k & 3) * 40 - 60))
    // vertical-frequency rows carry only the same sub-step bias
    (4 until 16).foreach(i => math.abs(grad(i)) should be <= 1)
    grad.slice(1, 4).exists(c => math.abs(c) > 1) shouldBe true
  }

  test("quantize/dequantize: levels shrink magnitude toward zero, " +
    "reconstruction error is bounded by the step, q=1 is lossless") {
    val rng = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val coeffs = Array.fill(16)(rng.nextInt(4001) - 2000)
      dequantize(quantize(coeffs, 1, 1), 1, 1).toSeq shouldBe coeffs.toSeq
      val (qdc, qac) = (13, 29)
      val rec = dequantize(quantize(coeffs, qdc, qac), qdc, qac)
      rec.zipWithIndex.foreach { case (r, i) =>
        val q = if (i == 0) qdc else qac
        math.abs(r - coeffs(i)) should be < q
        math.abs(r) should be <= math.abs(coeffs(i)) // toward zero
      }
    }
  }

  test("quantizePlane: distortion grows with the step, is tight at " +
    "q=4, and handles non-multiple-of-4 dimensions") {
    val rng = new scala.util.Random(3)
    val (w, h) = (19, 13) // deliberately ragged
    val plane = Array.fill(w * h)(rng.nextInt(256))
    def err(qdc: Int, qac: Int): Double = {
      val rec = quantizePlane(plane, w, h, qdc, qac)
      rec.length shouldBe plane.length
      rec.foreach { v => v should (be >= 0 and be <= 255) }
      plane.zip(rec).map { case (a, b) => math.abs(a - b) }.sum.toDouble /
        plane.length
    }
    val fine = err(4, 4)
    val mid = err(40, 72)
    val coarse = err(157, 284)
    fine should be < 2.0 // near-lossless at the smallest VP8 step
    fine should be <= mid
    mid should be <= coarse
  }

  test("webpEncodeDct: valid WebP out, alpha untouched, error " +
    "monotone in quality, q=100 near-lossless") {
    val rng = new scala.util.Random(11)
    val (w, h) = (21, 10)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rng.nextInt())
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val orig = img.getRGB(0, 0, w, h, null, 0, w)
    def at(q: Int): (Double, Boolean) = {
      val webp = ImageOps.webpEncodeDct(png, quality = q).get
      val px = WebpCodec.decode(webp).getRGB(0, 0, w, h, null, 0, w)
      var sum = 0L; var alphaOk = true
      px.indices.foreach { i =>
        Seq(16, 8, 0).foreach { s =>
          sum += math.abs(((px(i) >> s) & 0xff) - ((orig(i) >> s) & 0xff))
        }
        alphaOk &&= (px(i) >>> 24) == (orig(i) >>> 24)
      }
      (sum.toDouble / (px.length * 3), alphaOk)
    }
    val qs = Seq(0, 30, 60, 90, 100)
    val res = qs.map(at)
    res.foreach { case (_, alphaOk) => alphaOk shouldBe true }
    res.map(_._1).sliding(2).foreach { case Seq(lo, hi) =>
      lo should be >= hi } // coarser quality, more error
    res.last._1 should be < 2.0 // q=100 → step 4, near-lossless
  }
}
