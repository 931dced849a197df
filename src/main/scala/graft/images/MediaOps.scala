package graft.images

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Video/audio multimodal plumbing — the same opaque-binary column model
  * as [[ImageOps]] (payload as BinaryType, typed metadata struct
  * alongside), for media the JVM cannot decode without native codecs.
  *
  * THE CODEC IS A DELIBERATE STUB: this container ships no
  * ffmpeg/libavcodec, so `decodeContainer` below parses a tiny
  * deterministic fake container format (magic + rational fps/rate +
  * payload) instead of H.264/AAC. Everything AROUND the codec — the
  * output schema, the per-partition batched iteration, null-safe fault
  * handling, the frame-index arithmetic, and the explode-to-rows shape —
  * is the real production plumbing: swapping in a JNI codec changes ONE
  * function. (Mirrors the reference's attitude to heavyweight backends,
  * SURVEY.md §7.4: deterministic stand-ins with pinned semantics.)
  *
  * Scale design: `mapPartitions` (genuine per-row imperative decode =
  * the one justified use), so codec state/buffers are per-TASK, not
  * per-row; output frames explode to (id, frame_idx, frame) rows that
  * downstream image ops consume map-only. A 100 TB video corpus keeps
  * payloads on object storage and carries paths + byte-ranges (see
  * ImageOps scaladoc) — the frame-sampling arithmetic is unchanged.
  */
object MediaOps {

  /** Fake-container layout (all big-endian ints after a 4-byte magic):
    * "GVID" | num (fps numerator) | den (fps denominator) |
    * nFrames | frameBytes | payload (nFrames × frameBytes).
    * Deterministic and trivially constructible in tests. */
  val Magic: Array[Byte] = "GVID".getBytes("US-ASCII")

  final case class Container(fpsNum: Int, fpsDen: Int, nFrames: Int,
                             frameBytes: Int, payload: Array[Byte])

  /** THE STUB — replace with a real demuxer+codec to go to production.
    * Returns None on anything malformed (never throws: per-row fault
    * tolerance, R4 semantics). */
  def decodeContainer(bytes: Array[Byte]): Option[Container] = {
    if (bytes == null || bytes.length < 20) return None
    if (!bytes.take(4).sameElements(Magic)) return None
    val bb = java.nio.ByteBuffer.wrap(bytes, 4, 16)
    val (num, den, n, fb) = (bb.getInt, bb.getInt, bb.getInt, bb.getInt)
    if (num <= 0 || den <= 0 || n < 0 || fb <= 0) return None
    // fps < 1/1000 (one frame per >1000 s) is a malformed declaration,
    // not a video: an adversarial (num=1, den=Int.MaxValue) header would
    // make one frame span ~68 years and turn frameSample's per-interval
    // emission into an unbounded row stream. Rejecting here keeps the
    // per-row fault-tolerance contract (None, never a hung task).
    if (den > 1000L * num) return None
    if (bytes.length < 20 + n.toLong * fb) return None
    Some(Container(num, den, n, fb, java.util.Arrays.copyOfRange(
      bytes, 20, 20 + n * fb)))
  }

  /** Build a fake container (test/fixture helper). */
  def encodeContainer(c: Container): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(20 + c.payload.length)
    bb.put(Magic).putInt(c.fpsNum).putInt(c.fpsDen)
      .putInt(c.nFrames).putInt(c.frameBytes).put(c.payload)
    bb.array()
  }

  /** Output schema of [[frameSample]]: one row per sampled frame. */
  def frameSchema(idField: StructField): StructType = StructType(Seq(
    idField,
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = true)))

  /** Sample frames at `everyMs` intervals (media time, frame chosen by
    * floor(t·fps) — the standard "nearest preceding frame" rule) from a
    * binary media column. One output row per (input row, sampled frame);
    * undecodable rows contribute NO rows here — pair with [[mediaMeta]]
    * on the input to audit drops (F4 mask pattern). Frame-index math is
    * exact integer arithmetic on the rational fps, so a backfill
    * resamples identically.
    *
    * Per-partition batching via mapPartitions: codec state is per-task;
    * rows stream through without materializing the partition. */
  def frameSample(df: DataFrame, idCol: String, dataCol: String,
                  everyMs: Long): DataFrame = {
    require(everyMs > 0, "sampling interval must be positive")
    val idField = df.schema(idCol)
    val schema = frameSchema(idField)
    val idIdx = df.schema.fieldIndex(idCol)
    val dataIdx = df.schema.fieldIndex(dataCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.get(idIdx)
        val bytes =
          if (row.isNullAt(dataIdx)) null else row.getAs[Array[Byte]](dataIdx)
        decodeContainer(bytes).iterator.flatMap { c =>
          // t = k·everyMs; frame = floor(t·num / (1000·den)), while < n.
          // Exact integer arithmetic — no double time base drift. The
          // counter is a Long (an Int counter wraps at 2^31 samples and
          // turns a long-duration container into an infinite emitter),
          // and the multiply falls back to BigInt when t·num would
          // overflow (2 GB-payload containers with extreme rationals can
          // push t·num past Long range BEFORE f reaches n; a wrapped
          // negative f would never terminate the takeWhile). Termination
          // is then guaranteed: decodeContainer bounds fps ≥ 1/1000, so
          // f reaches n after finitely many exact steps.
          def frameAt(t: Long): Long =
            if (c.fpsNum == 0 || t <= Long.MaxValue / c.fpsNum)
              t * c.fpsNum / (1000L * c.fpsDen)
            else (BigInt(t) * c.fpsNum / (1000L * c.fpsDen))
              .min(BigInt(Long.MaxValue)).toLong
          Iterator.iterate(0L)(_ + everyMs)
            .map(t => (t, frameAt(t)))
            .takeWhile { case (_, f) => f < c.nFrames }
            .map { case (t, f) =>
              val fi = f.toInt
              Row(id, fi, t, java.util.Arrays.copyOfRange(
                c.payload, fi * c.frameBytes, (fi + 1) * c.frameBytes))
            }
        }
      }
    }(enc)
  }

  /** Output schema of [[audioFeatures]]: one row per NON-EMPTY analysis
    * window. `win_idx` is the absolute window ordinal (time / windowMs)
    * and is a LONG: a decodable low-rate container (fps down to 1/1000
    * Hz) with a small `windowMs` has duration/windowMs ≫ 2³¹ window
    * slots, and an Int ordinal would wrap negative. */
  def audioSchema(idField: StructField): StructType = StructType(Seq(
    idField,
    StructField("win_idx", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("zero_crossings", IntegerType, nullable = false),
    StructField("peak_abs", IntegerType, nullable = false)))

  /** Audio FEATURE EXTRACTION over the opaque-binary column — the
    * fourth multimodal verb (decode / frame-sample / resize /
    * feature-extract), same container model: an audio payload is the
    * [[Container]] with frameBytes = 2 (PCM16 big-endian samples) and
    * the rational "fps" as the sample rate. One output row per
    * NON-EMPTY `windowMs` analysis window: (id, win_idx, ts_ms, n_samples,
    * sum_sq, zero_crossings, peak_abs). Features are deliberately
    * INTEGER-EXACT evidence (Σs² as a LONG, crossing count, peak |s|)
    * rather than float RMS/dB — the engine's md5-hashable oracle
    * discipline; callers derive rms = sqrt(sum_sq/n) display-side.
    * sum_sq is overflow-safe: each s² ≤ 2³⁰, so a window needs > 2³³
    * samples (> 24 h at 48 kHz) to overflow a Long — and a window that
    * large is rejected by the everyMs/fps bounds the container
    * enforces.
    *
    * Window k covers samples [frameAt(k·windowMs), frameAt((k+1)·
    * windowMs)) — the same exact rational arithmetic as [[frameSample]]
    * (no float time base, backfills re-window identically). A zero
    * crossing is counted at i when sign(s[i−1]) ≠ sign(s[i])
    * (sign = `< 0`, so 0 is non-negative), counted WITHIN the window
    * only (window-local, so windows recompute independently under any
    * partitioning). Rows that are not PCM16 containers (wrong
    * frameBytes, malformed header) contribute NO rows — pair with
    * [[mediaMeta]] to audit drops (F4 mask pattern).
    *
    * EMPTY WINDOWS ARE NOT EMITTED: when `windowMs` is shorter than one
    * sample period (low-rate container, small window), window slots with
    * zero samples are skipped — `win_idx` stays the absolute slot
    * ordinal, so an absent ordinal MEANS "no samples in that slot", and
    * the rms = sqrt(sum_sq/n_samples) derivation the scaladoc above
    * prescribes never divides by zero. This also bounds the output and
    * the per-row work: emitted rows ≤ total samples (each carries ≥ 1),
    * and the slot iterator JUMPS over empty runs in exact integer
    * arithmetic rather than stepping per slot, so a 1/1000 Hz container
    * with windowMs=1 costs O(samples), not O(duration/windowMs) —
    * the same unbounded-emitter hazard `decodeContainer`'s fps bound
    * caps for [[frameSample]], re-scaled here by 1000·den/num/windowMs.
    *
    * Scale shape: identical to [[frameSample]] — mapPartitions decode
    * (per-task state), explode-to-rows output, downstream aggregation
    * of window rows is ordinary map-combined groupBy work. */
  def audioFeatures(df: DataFrame, idCol: String, dataCol: String,
                    windowMs: Long): DataFrame = {
    require(windowMs > 0, "analysis window must be positive")
    val schema = audioSchema(df.schema(idCol))
    val idIdx = df.schema.fieldIndex(idCol)
    val dataIdx = df.schema.fieldIndex(dataCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.get(idIdx)
        val bytes =
          if (row.isNullAt(dataIdx)) null else row.getAs[Array[Byte]](dataIdx)
        decodeContainer(bytes).iterator
          .filter(_.frameBytes == 2) // PCM16 contract; else not audio
          .flatMap { c =>
            def sampleAt(t: Long): Long =
              if (c.fpsNum == 0 || t <= Long.MaxValue / c.fpsNum)
                t * c.fpsNum / (1000L * c.fpsDen)
              else (BigInt(t) * c.fpsNum / (1000L * c.fpsDen))
                .min(BigInt(Long.MaxValue)).toLong
            def s(i: Long): Int = { // PCM16 BE sample i, sign-extended
              val o = (i * 2).toInt
              (bytesToShort(c.payload(o), c.payload(o + 1))).toInt
            }
            val n = c.nFrames.toLong
            // ceil(a·b / d) with BigInt fallback (a ≤ n ≤ 2³¹ but
            // b = 1000·den can reach ~2⁴¹, so a·b can pass Long range).
            def ceilMulDiv(a: Long, b: Long, d: Long): Long =
              if (a <= (Long.MaxValue - d) / b) (a * b + d - 1) / d
              else ((BigInt(a) * b + d - 1) / d)
                .min(BigInt(Long.MaxValue)).toLong
            // Walk window slots k = 0, 1, …; emit slots with ≥ 1 sample,
            // JUMP over empty runs (next slot whose start time reaches
            // the next sample) — O(samples) total, never O(slots).
            Iterator.unfold((0L, sampleAt(0L))) { case (k, start) =>
              if (start >= n) None
              else {
                val end = math.min(sampleAt((k + 1) * windowMs), n)
                if (end > start) {
                  var i = start
                  var sumSq = 0L; var zc = 0; var peak = 0
                  var prevNeg = false; var first = true
                  while (i < end) {
                    val v = s(i)
                    sumSq += v.toLong * v
                    val a = math.abs(v); if (a > peak) peak = a
                    val neg = v < 0
                    if (!first && neg != prevNeg) zc += 1
                    prevNeg = neg; first = false
                    i += 1
                  }
                  val row = Row(id, k, k * windowMs,
                    (end - start).toInt, sumSq, zc, peak)
                  Some((Some(row), (k + 1, sampleAt((k + 1) * windowMs))))
                } else {
                  // empty slot: the next possibly-non-empty slot is the
                  // first k' whose END time reaches sample start+1 —
                  // tMin = ceil((start+1)·1000·den / num) is the first t
                  // with sampleAt(t) > start, so (k'+1)·windowMs ≥ tMin,
                  // k' = ceil(tMin/windowMs) − 1. Every slot strictly
                  // between ends before tMin and is provably empty; slot
                  // k' itself is re-checked (it may start past `start`
                  // and still be empty — the loop then jumps again).
                  // Each step either emits or advances `start` by ≥ 1
                  // sample, so total steps ≤ 2·n.
                  val tMin = ceilMulDiv(start + 1, 1000L * c.fpsDen,
                    c.fpsNum)
                  val kN = math.max(k + 1,
                    (tMin + windowMs - 1) / windowMs - 1)
                  Some((None, (kN, sampleAt(kN * windowMs))))
                }
              }
            }.flatten
          }
      }
    }(enc)
  }

  private def bytesToShort(hi: Byte, lo: Byte): Short =
    (((hi & 0xff) << 8) | (lo & 0xff)).toShort

  /** Typed metadata struct for a media column (the F4 success-mask
    * pattern: `ok=false` rows are auditable, never exceptions — a null
    * payload is `ok=false` like any other undecodable row). A SCALAR
    * UDF: it stays in the scan-side projection (no shuffle, no extra
    * stage) but DOES close the whole-stage-codegen span at that
    * projection — the codec is imperative JVM code, so a codegen'd
    * native `Expression` would wrap the identical black-box call and
    * buy nothing. */
  def mediaMeta(df: DataFrame, dataCol: String): DataFrame = {
    val meta = udf((bytes: Array[Byte]) =>
      decodeContainer(bytes) match {
        case Some(c) => (c.fpsNum.toDouble / c.fpsDen, c.nFrames,
          c.nFrames.toLong * c.fpsDen * 1000L / c.fpsNum, true)
        case None => (0.0, 0, 0L, false)
      })
    df.withColumn("media_meta",
      meta(col(dataCol)).cast("struct<fps:double,n_frames:int," +
        "duration_ms:bigint,ok:boolean>"))
  }
}
