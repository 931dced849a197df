package graft.images

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** External-decoder conformance via committed fixtures: each
  * `golden/webp/<name>.webp` is [[WebpCodec]]'s output on the
  * deterministic [[GoldenGen.image]], and `<name>.rgba` is that file
  * decoded by libwebp's `WebPDecodeRGBA` (`tools/webp_libwebp_dump.py`).
  * Together the three assertions make the codec's "validated against the
  * canonical decoder" claim reproducible from the tree alone:
  *  - encoder determinism: today's encoder still emits the committed bytes
  *    (so the .rgba dump is a dump OF THIS encoder's output, not a stale
  *    artifact);
  *  - libwebp agreement: the repo decoder's pixels equal libwebp's,
  *    byte-for-byte, RGBA order;
  *  - self round-trip: decode(encode(img)) == img (ARGB ints).
  */
class GoldenWebpSpec extends AnyFunSuite with Matchers {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/golden/webp/$name")
    require(in != null, s"missing test resource golden/webp/$name")
    try in.readAllBytes() finally in.close()
  }

  /** BufferedImage → packed RGBA bytes, row-major — WebPDecodeRGBA's
    * output layout. */
  private def toRgba(img: java.awt.image.BufferedImage): Array[Byte] = {
    val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0,
      img.getWidth)
    val out = new Array[Byte](px.length * 4)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i * 4) = ((p >>> 16) & 0xff).toByte    // R
      out(i * 4 + 1) = ((p >>> 8) & 0xff).toByte // G
      out(i * 4 + 2) = (p & 0xff).toByte         // B
      out(i * 4 + 3) = ((p >>> 24) & 0xff).toByte // A
      i += 1
    }
    out
  }

  GoldenGen.fixtures.foreach { case (name, w, h, seed) =>
    test(s"$name: encoder reproduces the committed .webp bit-exactly") {
      val img = GoldenGen.image(w, h, seed)
      val encoded = WebpCodec.encodeLossless(img).get
      encoded shouldBe resource(s"$name.webp")
    }

    test(s"$name: repo decoder matches libwebp's WebPDecodeRGBA dump") {
      val decoded = WebpCodec.decode(resource(s"$name.webp"))
      decoded.getWidth shouldBe w
      decoded.getHeight shouldBe h
      toRgba(decoded) shouldBe resource(s"$name.rgba")
    }

    test(s"$name: decode(encode(img)) round-trips the ARGB pixels") {
      val img = GoldenGen.image(w, h, seed)
      val back = WebpCodec.decode(WebpCodec.encodeLossless(img).get)
      back.getRGB(0, 0, w, h, null, 0, w) shouldBe
        img.getRGB(0, 0, w, h, null, 0, w)
    }
  }
}
