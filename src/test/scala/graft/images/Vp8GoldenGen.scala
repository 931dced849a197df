package graft.images

/** Regenerates the committed LOSSY (VP8) golden fixtures under
  * `src/test/resources/golden/vp8/`.
  *
  * Each `<name>.webp` is [[Vp8Encoder]]'s output on a deterministic
  * image; `<name>.pred.yuv` is the encoder's OWN bit-exact
  * reconstruction (visible region, Y then U then V planes); and the
  * sibling `<name>.libwebp.yuv` is the `.webp` decoded by the
  * canonical C decoder (libwebp's `WebPDecodeYUV`, via
  * `tools/vp8_libwebp_dump.py`). [[Vp8GoldenSpec]] asserts (a) the
  * encoder still produces the committed bytes, and (b) the predicted
  * reconstruction equals libwebp's decode byte-for-byte — the full
  * conformance claim for the entropy/bitstream layer, checkable from
  * the committed tree with no native code at test time.
  *
  * Regenerate (only when the bitstream layout changes on purpose):
  * `sbt "Test/runMain graft.images.Vp8GoldenGen"`, then
  * `python3 tools/vp8_libwebp_dump.py` on a machine with libwebp. */
object Vp8GoldenGen {

  /** Deterministic ARGB generators — distinct content classes so the
    * token layer sees flat runs, hard edges, smooth ramps, and dense
    * noise; odd sizes exercise the padding/cropping paths. */
  val fixtures: Seq[(String, Int, Int, Int, (Int, Int) => Int)] = Seq(
    ("vp8_gradient_64x48_q40", 64, 48, 40,
      (x, y) => 0xff000000 | ((x * 4) << 16) | ((y * 5) << 8) |
        ((x + y) * 2)),
    ("vp8_checker_80x80_q20", 80, 80, 20,
      (x, y) => if (((x / 8) + (y / 8)) % 2 == 0) 0xffd02020
        else 0xff2040c0),
    ("vp8_noise_33x17_q75", 33, 17, 75, (x, y) => {
      val s = (x * 2654435761L + y * 40503L + 12345L) & 0xffffffffL
      0xff000000 | ((s % 255).toInt << 16) |
        (((s >> 8) % 255).toInt << 8) | ((s >> 16) % 255).toInt
    }),
    ("vp8_flat_128x96_q90", 128, 96, 90, (_, _) => 0xff808080))

  def encodeFixture(name: String): Vp8Encoder.Encoded = {
    val (_, w, h, qindex, px) =
      fixtures.find(_._1 == name).getOrElse(sys.error(s"unknown $name"))
    val argb = Array.tabulate(w * h)(i => px(i % w, i / w))
    Vp8Encoder.encodeArgb(argb, w, h, qindex) // names carry the qindex
  }

  /** Visible-region reconstruction planes as one Y+U+V byte blob. */
  def predictedYuv(e: Vp8Encoder.Encoded): Array[Byte] = {
    val cw = (e.w + 1) / 2; val ch = (e.h + 1) / 2
    val out = new java.io.ByteArrayOutputStream()
    var j = 0
    while (j < e.h) {
      var i = 0
      while (i < e.w) { out.write(e.yRec(j * e.padW + i)); i += 1 }
      j += 1
    }
    j = 0
    while (j < ch) {
      var i = 0
      while (i < cw) { out.write(e.uRec(j * (e.padW / 2) + i)); i += 1 }
      j += 1
    }
    j = 0
    while (j < ch) {
      var i = 0
      while (i < cw) { out.write(e.vRec(j * (e.padW / 2) + i)); i += 1 }
      j += 1
    }
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/test/resources/golden/vp8")
    dir.mkdirs()
    fixtures.foreach { case (name, _, _, _, _) =>
      val enc = encodeFixture(name)
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.webp").toPath, enc.webp)
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.pred.yuv").toPath, predictedYuv(enc))
      println(s"wrote $name.webp (${enc.webp.length} bytes) + pred.yuv")
    }
  }
}
