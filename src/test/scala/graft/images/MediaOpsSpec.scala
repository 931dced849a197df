package graft.images

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  /** 10 frames of 4 bytes each at 25/1 fps (40 ms per frame); frame i
    * filled with byte value i. */
  private def vid(nFrames: Int = 10, fpsNum: Int = 25, fpsDen: Int = 1)
  : Array[Byte] = {
    val payload = (0 until nFrames).flatMap(i =>
      Array.fill(4)(i.toByte)).toArray
    MediaOps.encodeContainer(MediaOps.Container(
      fpsNum, fpsDen, nFrames, 4, payload))
  }

  test("container round-trips; malformed bytes decode to None, not throw") {
    val c = MediaOps.decodeContainer(vid()).get
    c.fpsNum shouldBe 25
    c.nFrames shouldBe 10
    c.payload.length shouldBe 40
    MediaOps.decodeContainer(null) shouldBe None
    MediaOps.decodeContainer(Array[Byte](1, 2, 3)) shouldBe None
    MediaOps.decodeContainer("GVIDgarbage".getBytes) shouldBe None
    // truncated payload
    MediaOps.decodeContainer(vid().dropRight(1)) shouldBe None
  }

  test("adversarial fps declaration rejects instead of emitting forever") {
    // num=1, den=MaxInt: one frame spanning ~68 years — before the
    // fps >= 1/1000 bound this turned frameSample into an unbounded
    // per-interval emitter (Int counter wrap + f stuck at 0)
    val evil = vid(nFrames = 1, fpsNum = 1, fpsDen = Int.MaxValue)
    MediaOps.decodeContainer(evil) shouldBe None
    val out = MediaOps.frameSample(
      Seq((1L, evil)).toDF("id", "data"), "id", "data", everyMs = 100)
    out.count() shouldBe 0L // undecodable row contributes no rows (R4)
    // the slowest LEGAL rate (exactly 1 frame per 1000 s) still decodes
    // and terminates with the right sample count
    val slow = vid(nFrames = 2, fpsNum = 1, fpsDen = 1000)
    MediaOps.decodeContainer(slow).isDefined shouldBe true
    val n = MediaOps.frameSample(
      Seq((1L, slow)).toDF("id", "data"), "id", "data",
      everyMs = 500000L).count()
    n shouldBe 4L // 2 frames x 10^6 ms, sampled every 5*10^5 ms
  }

  test("frameSample picks floor(t*fps) every interval; exact integer time") {
    val df = Seq((1L, vid()), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "data")
    val out = MediaOps.frameSample(df, "id", "data", everyMs = 100L)
      .orderBy("ts_ms").collect()
    // 10 frames @25fps = 400 ms of media; t = 0,100,200,300 → frames
    // floor(t*25/1000) = 0,2,5,7
    out.map(_.getLong(0)).distinct.toSeq shouldBe Seq(1L) // null row drops
    out.map(r => (r.getLong(2), r.getInt(1))).toSeq shouldBe
      Seq((0L, 0), (100L, 2), (200L, 5), (300L, 7))
    // each frame's bytes are the sampled frame's fill value
    out.foreach { r =>
      r.getAs[Array[Byte]](3).toSeq shouldBe
        Array.fill(4)(r.getInt(1).toByte).toSeq
    }
  }

  test("rational fps stays exact (30000/1001 NTSC — no double drift)") {
    val df = Seq((1L, vid(nFrames = 300, fpsNum = 30000, fpsDen = 1001)))
      .toDF("id", "data")
    val out = MediaOps.frameSample(df, "id", "data", everyMs = 1000L)
      .orderBy("ts_ms").collect()
    // frame at t=1000 ms: floor(1000*30000/(1000*1001)) = floor(29.97) = 29
    out.map(r => (r.getLong(2), r.getInt(1))).take(3).toSeq shouldBe
      Seq((0L, 0), (1000L, 29), (2000L, 59))
  }

  test("mediaMeta: typed struct with ok mask; bad rows flagged not thrown") {
    val df = Seq((1L, vid()), (2L, Array[Byte](9, 9)),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "data")
    val out = MediaOps.mediaMeta(df, "data").select("id", "media_meta.*")
      .orderBy("id").collect()
    out(0).getDouble(1) shouldBe 25.0 // fps
    out(0).getInt(2) shouldBe 10      // n_frames
    out(0).getLong(3) shouldBe 400L   // duration_ms
    out(0).getBoolean(4) shouldBe true
    out(1).getBoolean(4) shouldBe false
    out(2).getBoolean(4) shouldBe false // null payload: ok=false, no throw
  }

  test("audioFeatures: windowed integer-exact PCM16 features, hand-" +
    "computed; boundary crossings are window-local; non-audio and " +
    "malformed rows contribute no rows") {
    // 8 PCM16 samples at 4 Hz (250 ms/sample), 500 ms windows -> 2
    // samples per window
    val samples = Seq[Short](1000, -1000, 1000, -1000, 0, 2000, -3000, 500)
    val payload = samples.flatMap(s =>
      Seq(((s >> 8) & 0xff).toByte, (s & 0xff).toByte)).toArray
    val aud = MediaOps.encodeContainer(MediaOps.Container(
      4, 1, 8, 2, payload))
    val df = Seq(
      (1L, aud),
      (2L, vid()),                       // frameBytes=4: not PCM16
      (3L, Array[Byte](9, 9)),           // malformed
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "data")
    val rows = MediaOps.audioFeatures(df, "id", "data", 500L)
      .orderBy("id", "win_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5), r.getInt(6)))
    rows shouldBe Array(
      (1L, 0L, 0L, 2, 2000000L, 1, 1000),    // 1000,-1000
      (1L, 1L, 500L, 2, 2000000L, 1, 1000),  // 1000,-1000
      // -1000 -> 0 boundary sign change is NOT counted in either window
      (1L, 2L, 1000L, 2, 4000000L, 0, 2000), // 0,2000 (0 is non-negative)
      (1L, 3L, 1500L, 2, 9250000L, 1, 3000)) // -3000,500
  }

  test("audioFeatures skips empty window slots: win_idx is the absolute " +
    "slot ordinal, emitted rows are bounded by the sample count") {
    // 5 samples at 1 Hz (1000 ms/sample) with 100 ms windows: 10 slots
    // per sample, only every 10th non-empty. Sample i sits in the slot
    // whose [floor(k·W·fps), floor((k+1)·W·fps)) range contains it —
    // at 1 Hz that is slot 9 (t=900: [0,1)), not slot 0 ([0,0) is
    // empty). The jump logic must emit exactly 5 rows with win_idx
    // 9,19,29,39,49 — not 50 rows, and never an n_samples=0 row (the
    // rms = sqrt(sum_sq/n) derivation the scaladoc prescribes would
    // divide by zero on those).
    val samples = Seq[Short](100, -200, 300, -400, 500)
    val payload = samples.flatMap(s =>
      Seq(((s >> 8) & 0xff).toByte, (s & 0xff).toByte)).toArray
    val aud = MediaOps.encodeContainer(MediaOps.Container(
      1, 1, 5, 2, payload))
    val rows = MediaOps.audioFeatures(
      Seq((1L, aud)).toDF("id", "data"), "id", "data", 100L)
      .orderBy("win_idx").collect()
    rows.map(_.getLong(1)).toSeq shouldBe Seq(9L, 19L, 29L, 39L, 49L)
    rows.map(_.getLong(2)).toSeq shouldBe
      Seq(900L, 1900L, 2900L, 3900L, 4900L) // ts_ms = win_idx * windowMs
    all(rows.map(_.getInt(3))) shouldBe 1 // one sample each, never 0
    rows.map(_.getInt(6)).toSeq shouldBe Seq(100, 200, 300, 400, 500)
  }

  test("audioFeatures property: random PCM/rates/windows match an " +
    "independent brute-force reference (windowing arithmetic guard)") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 8).map { i =>
      val n = 1 + rnd.nextInt(200)
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val (num, den) = (1 + rnd.nextInt(50), 1 + rnd.nextInt(4))
      (i.toLong, samples, num, den)
    } ++ Seq( // low-rate cases: sample period >> window, so most slots
      // are empty — pins the jump logic against the step-every-slot ref
      (100L, Array.fill(7)((rnd.nextInt(65536) - 32768).toShort), 1, 3),
      (101L, Array.fill(40)((rnd.nextInt(65536) - 32768).toShort), 2, 1))
    val winMs = 170L
    // independent reference: sample index of time t = floor(t*num /
    // (1000*den)) computed with BigInt, features by direct PER-SLOT
    // iteration (no jumps — independence from the engine's shortcut),
    // then empty slots dropped (the emit contract)
    def ref(samples: Array[Short], num: Int, den: Int)
    : Seq[(Long, Long, Int, Long, Int, Int)] = {
      def at(t: Long): Long =
        (BigInt(t) * num / (1000 * den)).toLong
      Iterator.iterate(0L)(_ + winMs).map(t => (t, at(t)))
        .takeWhile(_._2 < samples.length).zipWithIndex
        .map { case ((t, st), k) =>
          val en = math.min(at(t + winMs), samples.length.toLong).toInt
          val w = samples.slice(st.toInt, en)
          val zc = w.toSeq.sliding(2).count {
            case Seq(a, b) => (a < 0) != (b < 0); case _ => false }
          (k.toLong, t, w.length, w.map(v => v.toLong * v).sum, zc,
            if (w.isEmpty) 0 else w.map(v => math.abs(v.toInt)).max)
        }.filter(_._3 > 0).toSeq
    }
    val df = cases.map { case (id, samples, num, den) =>
      val payload = samples.flatMap(s =>
        Array(((s >> 8) & 0xff).toByte, (s & 0xff).toByte))
      (id, MediaOps.encodeContainer(MediaOps.Container(
        num, den, samples.length, 2, payload)))
    }.toDF("id", "data")
    val got = MediaOps.audioFeatures(df, "id", "data", winMs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getInt(5), r.getInt(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    cases.foreach { case (id, samples, num, den) =>
      withClue(s"id=$id rate=$num/$den: ") {
        got.getOrElse(id, Seq.empty) shouldBe ref(samples, num, den)
      }
    }
  }

  test("frameSample property: random payloads/rates/intervals match an " +
    "independent brute-force reference (frame-index arithmetic guard)") {
    val rnd = new scala.util.Random(7)
    val cases = (1 to 10).map { i =>
      val n = rnd.nextInt(120) // include the occasional 0-frame container
      val fb = 1 + rnd.nextInt(5)
      val payload = Array.fill(n * fb)(rnd.nextInt(256).toByte)
      val (num, den) = (1 + rnd.nextInt(60), 1 + rnd.nextInt(4))
      val everyMs = (1 + rnd.nextInt(400)).toLong
      (i.toLong, payload, n, fb, num, den, everyMs)
    }
    // independent reference: BigInt floor(t*num/(1000*den)) per interval
    def ref(payload: Array[Byte], n: Int, fb: Int, num: Int, den: Int,
            everyMs: Long): Seq[(Int, Long, Seq[Byte])] =
      Iterator.iterate(0L)(_ + everyMs)
        .map(t => (t, (BigInt(t) * num / (1000 * den)).toLong))
        .takeWhile(_._2 < n)
        .map { case (t, f) =>
          (f.toInt, t, payload.slice(f.toInt * fb, (f.toInt + 1) * fb).toSeq)
        }.toSeq
    cases.foreach { case (id, payload, n, fb, num, den, everyMs) =>
      val df = Seq((id, MediaOps.encodeContainer(MediaOps.Container(
        num, den, n, fb, payload)))).toDF("id", "data")
      val got = MediaOps.frameSample(df, "id", "data", everyMs)
        .collect().map(r => (r.getInt(1), r.getLong(2),
          r.getAs[Array[Byte]](3).toSeq)).sortBy(_._2).toSeq
      withClue(s"id=$id n=$n fb=$fb rate=$num/$den every=$everyMs: ") {
        got shouldBe ref(payload, n, fb, num, den, everyMs)
      }
    }
  }

  test("sampled frames feed the image pipeline shape (binary column ops)") {
    // the explode-to-rows output is directly consumable by ImageOps-style
    // map-only binary transforms — here a simple length/meta projection
    val df = Seq((7L, vid())).toDF("id", "data")
    val frames = MediaOps.frameSample(df, "id", "data", everyMs = 200L)
    val shaped = frames.withColumn("n_bytes", expr("length(frame)"))
    shaped.agg(min("n_bytes"), max("n_bytes")).first().toSeq shouldBe
      Seq(4, 4)
    // plan is map-only: no exchange introduced by the sampling itself
    frames.queryExecution.executedPlan.toString should not include "Exchange"
  }
}
