package graft.images

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Conformance gate for the REAL lossy WebP (VP8) encoder, from the
  * committed tree alone:
  *
  *  1. determinism — re-encoding each deterministic fixture source
  *     reproduces the committed `.webp` byte-for-byte;
  *  2. libwebp agreement — the encoder's own bit-exact reconstruction
  *     (`.pred.yuv`, what RFC 6386 says a decoder MUST compute from
  *     our bitstream) equals the canonical C decoder's actual output
  *     (`.libwebp.yuv`, dumped by tools/vp8_libwebp_dump.py).
  *
  * Together these pin the whole entropy/bitstream layer: boolean
  * coder, header layout, mode trees, token tree + probability tables,
  * quantizer lookups, Y2 Walsh–Hadamard, and the reconstruction loop.
  * A drift anywhere flips (1); a misunderstanding of the FORMAT
  * (tables, tree shape, contexts) flips (2). */
class Vp8GoldenSpec extends AnyFunSuite with Matchers {

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/golden/vp8/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  Vp8GoldenGen.fixtures.foreach { case (name, w, h, qindex, _) =>
    test(s"$name: encoder reproduces the committed bitstream") {
      val enc = Vp8GoldenGen.encodeFixture(name)
      enc.webp.toSeq shouldBe res(s"$name.webp").toSeq
    }

    test(s"$name: predicted reconstruction equals libwebp's decode") {
      val enc = Vp8GoldenGen.encodeFixture(name)
      val pred = Vp8GoldenGen.predictedYuv(enc)
      pred.toSeq shouldBe res(s"$name.libwebp.yuv").toSeq
      // and the committed pred.yuv is in sync with the encoder
      pred.toSeq shouldBe res(s"$name.pred.yuv").toSeq
    }
  }

  test("bool encoder round-trips against an RFC 6386 bool decoder") {
    val rng = new scala.util.Random(7)
    val bits = Array.fill(5000)((rng.nextInt(2), 1 + rng.nextInt(254)))
    val e = new Vp8BoolEncoder
    bits.foreach { case (b, p) => e.put(b, p) }
    val data = e.stop()
    // reference decoder (normative §7 algorithm, test-only)
    var value = ((data(0) & 0xff) << 8) | (data(1) & 0xff)
    var range = 255
    var pos = 2
    var bitCnt = 0
    def get(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val SPLIT = split << 8
      val ret = if (value >= SPLIT) {
        range -= split; value -= SPLIT; 1
      } else { range = split; 0 }
      while (range < 128) {
        value = (value << 1) & 0xffff
        range <<= 1
        bitCnt += 1
        if (bitCnt == 8) {
          bitCnt = 0
          if (pos < data.length) { value |= data(pos) & 0xff; pos += 1 }
        }
      }
      ret
    }
    bits.foreach { case (b, p) => get(p) shouldBe b }
  }

  test("walsh4x4 / invWalsh4x4 round-trip within ±1 on the DCT-DC " +
    "domain (fidelity-only: the decoder sees LEVELS, so conformance " +
    "never depends on the forward form)") {
    val rng = new scala.util.Random(3)
    (1 to 300).foreach { _ =>
      // fdct DC outputs of 8-bit residuals live in ~[-4080, 4080]
      val in = Array.fill(16)(rng.nextInt(8161) - 4080)
      val rt = Vp8Transform.invWalsh4x4(Vp8Encoder.walsh4x4(in))
      var i = 0
      while (i < 16) {
        math.abs(rt(i) - in(i)) should be <= 1
        i += 1
      }
    }
  }

  test("quantizer lookups carry the normative ranges") {
    Vp8Tables.DcQLookup.head shouldBe 4
    Vp8Tables.DcQLookup.last shouldBe 157
    Vp8Tables.AcQLookup.head shouldBe 4
    Vp8Tables.AcQLookup.last shouldBe 284
    Vp8Tables.DcQLookup.sliding(2).foreach { w =>
      w(0) should be <= w(1) // monotone
    }
    Vp8Tables.CoeffUpdateProbs.length shouldBe 1056
    Vp8Tables.DefaultCoeffProbs.length shouldBe 1056
    all(Vp8Tables.CoeffUpdateProbs) should be >= 17
    all(Vp8Tables.DefaultCoeffProbs) should be >= 1
  }

  test("webpEncodeLossy emits a RIFF VP8 container with the right " +
    "dimensions and keyframe tag") {
    val img = new java.awt.image.BufferedImage(50, 30,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until 30).foreach(y => (0 until 50).foreach(x =>
      img.setRGB(x, y, 0xff000000 | (x * 5 << 16) | (y * 8 << 8) | 0x40)))
    val png = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val out = ImageOps.webpEncodeLossy(png, quality = 60).get
    new String(out, 0, 4, "ASCII") shouldBe "RIFF"
    new String(out, 8, 4, "ASCII") shouldBe "WEBP"
    new String(out, 12, 4, "ASCII") shouldBe "VP8 "
    val frame = out.drop(20)
    (frame(0) & 1) shouldBe 0 // keyframe
    frame.slice(3, 6).toSeq shouldBe Seq(0x9d.toByte, 0x01.toByte,
      0x2a.toByte)
    val w = ((frame(6) & 0xff) | ((frame(7) & 0x3f) << 8))
    val h = ((frame(8) & 0xff) | ((frame(9) & 0x3f) << 8))
    (w, h) shouldBe ((50, 30))
  }
}
