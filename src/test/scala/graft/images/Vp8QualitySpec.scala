package graft.images

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Standing rate-distortion guard for the VP8 encoder's documented
  * quality scope (DC_PRED only, loop filter 0, uncompressed ALPH):
  * the r19 verdict set a bar — if the size gap to the SYSTEM encoder
  * at matched PSNR exceeds 2× (geometric mean over the golden
  * fixtures), B_PRED/loop-filter work is warranted; the r20
  * measurement (`tools/vp8_quality_report.py`) read 1.57×, so the
  * scope stands as a documented rate (not capability) gap. This spec
  * keeps that ruling CHECKABLE: it re-runs the measurement and fails
  * if the gap ever crosses the bar (an encoder regression, or a much
  * stronger system encoder moving the goalposts) — at which point the
  * carry must be re-adjudicated, not silently believed.
  *
  * Skips loudly when libwebp is absent (exit 42 — the conformance
  * sweep's convention). */
class Vp8QualitySpec extends AnyFunSuite with Matchers {

  test("rate gap to the system encoder at matched PSNR stays under " +
    "the 2x investment bar (geometric mean over the golden fixtures)") {
    val tool = PyTools.repoTool("vp8_quality_report.py")
      .fold(fail(_), identity)
    val (rc, out) = PyTools.runPython(tool)
    if (rc == 42)
      cancel("SKIPPED LOUDLY: libwebp.so.7 not available — the " +
        "rate-distortion comparison needs the system encoder/decoder")
    withClue(out) {
      rc shouldBe 0
      val gm = "geometric-mean size ratio[^:]*: ([0-9.]+)x".r
        .findFirstMatchIn(out)
        .getOrElse(fail("report printed no geometric-mean line"))
        .group(1).toDouble
      // the r19 verdict's bar: >2x at matched PSNR = invest in
      // B_PRED/loop-filter. Measured 1.57x in r20; a crossing means
      // the documented-carry ruling needs re-adjudication. The report
      // excludes any unmatched (q=100 fallback) fixture from the
      // geomean, so a crossing is a real rate regression, not a
      // denominator artifact; EVERY fixture must have matched (the
      // counts are parsed, not hardcoded, so adding a fixture to the
      // python report doesn't spuriously fail this spec)
      val m = "over (\\d+)/(\\d+) matched".r.findFirstMatchIn(out)
        .getOrElse(fail("report printed no matched-count line"))
      m.group(1) shouldBe m.group(2)
      gm should be < 2.0
    }
  }
}
