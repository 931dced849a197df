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
    val df = Seq((1L, vid()), (2L, Array[Byte](9, 9)))
      .toDF("id", "data")
    val out = MediaOps.mediaMeta(df, "data").select("id", "media_meta.*")
      .orderBy("id").collect()
    out(0).getDouble(1) shouldBe 25.0 // fps
    out(0).getInt(2) shouldBe 10      // n_frames
    out(0).getLong(3) shouldBe 400L   // duration_ms
    out(0).getBoolean(4) shouldBe true
    out(1).getBoolean(4) shouldBe false
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
