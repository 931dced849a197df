package graft.images

import java.awt.image.BufferedImage

/** Regenerates the committed WebP golden fixtures under
  * `src/test/resources/golden/webp/`.
  *
  * The fixtures make the codec's "validated against libwebp" claim
  * reproducible IN-REPO: each `<name>.webp` is this encoder's output on a
  * deterministic image, and the sibling `<name>.rgba` is that exact file
  * decoded by the canonical C decoder (libwebp's `WebPDecodeRGBA`, via
  * `tools/webp_libwebp_dump.py`). [[GoldenWebpSpec]] then asserts
  * (a) the encoder still produces the committed bytes, and (b) the repo
  * decoder agrees byte-for-byte with libwebp's decode of them.
  *
  * Regenerate (only when the encoder's bitstream layout changes on
  * purpose): `sbt "Test/runMain graft.images.GoldenGen"`, then
  * `python3 tools/webp_libwebp_dump.py` on a machine with libwebp. */
object GoldenGen {

  /** Deterministic ARGB image: LCG pixels cover the full channel/alpha
    * range; odd dimensions exercise the bit-packer's padding paths. */
  def image(w: Int, h: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var s = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, (s >>> 32).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** (name, width, height, seed) — one odd-size, one larger. */
  val fixtures: Seq[(String, Int, Int, Long)] =
    Seq(("golden_13x7", 13, 7, 42L), ("golden_64x37", 64, 37, 7L))

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/test/resources/golden/webp")
    dir.mkdirs()
    fixtures.foreach { case (name, w, h, seed) =>
      val bytes = WebpCodec.encodeLossless(image(w, h, seed))
        .getOrElse(sys.error(s"encode failed for $name"))
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.webp").toPath, bytes)
      println(s"wrote $name.webp (${bytes.length} bytes)")
    }
  }
}
