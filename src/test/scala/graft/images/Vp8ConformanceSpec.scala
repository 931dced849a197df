package graft.images

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RANDOMIZED libwebp conformance sweep for the VP8 entropy/bitstream
  * layer — the breadth the four fixed goldens cannot give: rare token
  * contexts, the cat5/cat6 extra-bit paths (large levels at qindex 0
  * under high-contrast content), every dimension class mod 16
  * (including 1×1, single-row, single-column), and both qindex
  * extremes. Plus the EXTENDED container path: translucent images
  * carry an uncompressed ALPH chunk that libwebp's `WebPDecodeRGBA`
  * must return byte-exactly.
  *
  * Protocol: a SEEDED generator builds N images across content
  * classes (noise, hard-edge checker, smooth gradient, flat,
  * saturated stripes) × forced edge dims × forced qindex extremes;
  * each encodes through [[Vp8Encoder]]; the `.webp` and the encoder's
  * own predicted reconstruction land in a temp dir; the canonical C
  * decoder (libwebp via `tools/vp8_conformance_check.py`) then
  * decodes every file and byte-compares. A divergence ANYWHERE is a
  * conformance bug in the encoder, never "acceptable drift" — RFC
  * 6386 reconstruction is bit-exact by definition.
  *
  * Skips loudly (never silently passes) when libwebp.so.7 is not on
  * the box — exit code 42 from the checker. */
class Vp8ConformanceSpec extends AnyFunSuite with Matchers {

  private val N = 80 // ≥64 per the sweep's design; seeded, so stable

  /** Content classes — chosen for the token-layer paths they hit. */
  private def pixel(cls: Int, x: Int, y: Int, rnd: Long): Int = cls match {
    case 0 => // dense full-range noise: deep token trees, all bands
      val s = (x * 2654435761L + y * 40503L + rnd) & 0xffffffffL
      0xff000000 | ((s % 256).toInt << 16) |
        (((s >> 8) % 256).toInt << 8) | ((s >> 16) % 256).toInt
    case 1 => // hard 2px checker: maximal AC energy → cat5/cat6 levels
      if (((x / 2) + (y / 2)) % 2 == 0) 0xffffffff else 0xff000000
    case 2 => // smooth ramp: small levels, long zero runs, EOB paths
      0xff000000 | (((x * 3 + (rnd & 63)).toInt & 0xff) << 16) |
        (((y * 5) & 0xff) << 8) | ((x + y) & 0xff)
    case 3 => // flat mid-gray: pure DC/EOB, the WHT-only path
      0xff808080
    case _ => // saturated stripes: chroma extremes (U/V far from 128)
      if ((x / 4) % 2 == 0) 0xffff0010 else 0xff00ff20
  }

  test(s"seeded sweep: $N random images × sizes 1×1…130×98 × qindex " +
    "0…127 (alpha every 4th) — libwebp decode byte-matches the " +
    "encoder's predicted reconstruction") {
    val rng = new scala.util.Random(20260815L)
    // forced edge cases first: dimension classes mod 16 incl. the
    // degenerate ones, and both quantizer extremes
    val forced = Seq(
      (1, 1, 0), (1, 1, 127), (16, 16, 0), (17, 16, 127), (16, 17, 63),
      (1, 98, 31), (130, 1, 96), (15, 15, 1), (33, 17, 126),
      (130, 98, 0), (31, 33, 127), (48, 48, 110))
    val cases = forced.map { case (w, h, q) => (w, h, q) } ++
      Seq.fill(N - forced.size)((1 + rng.nextInt(130),
        1 + rng.nextInt(98), rng.nextInt(128)))
    val dir = java.nio.file.Files
      .createTempDirectory("vp8sweep").toFile
    cases.zipWithIndex.foreach { case ((w, h, q), i) =>
      val cls = i % 5
      val seed = rng.nextLong() & 0xffffffL
      val withAlpha = i % 4 == 3
      val argb = Array.tabulate(w * h) { k =>
        val (x, y) = (k % w, k / w)
        val p = pixel(cls, x, y, seed)
        if (withAlpha) (((x * 7 + y * 13 + i) % 256) << 24) | (p & 0xffffff)
        else p
      }
      val enc =
        if (withAlpha) Vp8Encoder.encodeArgbAlpha(argb, w, h, q)
        else Vp8Encoder.encodeArgb(argb, w, h, q)
      val name = f"sweep_$i%03d_${w}x${h}_q$q"
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.webp").toPath, enc.webp)
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.pred.yuv").toPath,
        Vp8GoldenGen.predictedYuv(enc))
      if (withAlpha)
        java.nio.file.Files.write(
          new java.io.File(dir, s"$name.alpha").toPath,
          argb.map(p => ((p >>> 24) & 0xff).toByte))
    }
    val tool = PyTools.repoTool("vp8_conformance_check.py")
      .fold(fail(_), identity)
    val (rc, out) = PyTools.runPython(tool, dir.getAbsolutePath)
    if (rc == 42)
      cancel("SKIPPED LOUDLY: libwebp.so.7 not available on this box — " +
        "the randomized VP8 conformance sweep needs the canonical C " +
        "decoder as its oracle (the committed goldens still gate the " +
        "fixed fixtures in Vp8GoldenSpec)")
    withClue(out) {
      rc shouldBe 0
      out should include(s"== $N pass, 0 fail ==")
    }
    dir.listFiles.foreach(_.delete()); dir.delete()
  }
}
