package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpec {

  /** Stop a (possibly still-running) streaming query without killing an
    * in-flight micro-batch: `stop()` mid-batch aborts the task commit and
    * sprays `DataWritingSparkTask: Aborting commit` ERRORs through the
    * suite log, burying any real failure. Draining with
    * `processAllAvailable()` first makes the stop a clean no-op-ish
    * shutdown (AvailableNow queries have usually self-terminated already —
    * the drain only matters when `awaitTermination` timed out). */
  private def gracefulStop(q: org.apache.spark.sql.streaming.StreamingQuery)
  : Unit = {
    if (q.isActive) {
      try q.processAllAvailable() catch { case _: Throwable => () }
    }
    q.stop()
  }

  test("AvailableNow backfill: windowed counts match batch for closed windows") {
    val dir = Files.createTempDirectory("stream").toFile.getAbsolutePath
    // copy a slice of events to a standalone stream source dir
    val src = spark.read.parquet(s"$sf0001/events.parquet")
    val ev = graft.util.Timestamps.normalizeEventTs(src, "ts")
    ev.write.parquet(s"$dir/src")

    val streamed = Streams.backfillWindowed(spark, s"$dir/src",
      s"$dir/sink", s"$dir/ckpt")

    val batch = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    // append-mode emits only watermark-closed windows → subset of batch,
    // but every emitted row must agree exactly with the batch result
    val joined = streamed.alias("s").join(batch.alias("b"),
      Seq("ws", "event_type"))
    joined.count() shouldBe streamed.count()
    joined.filter(col("s.n") =!= col("b.n")).count() shouldBe 0
    streamed.count() should be > 0L
  }

  test("sessionize groups events within the gap into one session") {
    import spark.implicits._
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val events = Seq(
      Streams.Event(1, t(0), 7L, "click", 1.0),
      Streams.Event(2, t(10), 7L, "click", 2.0),
      Streams.Event(3, t(100), 7L, "click", 4.0), // > 30 min gap → new
      Streams.Event(4, t(5), 9L, "view", 8.0)
    ).toDS()
    // batch Dataset drive of the same state logic (mapGroups equivalent):
    // per user, fold sorted events with the session gap
    val sessions = events.groupByKey(_.user_id).flatMapGroups {
      (uid, it) =>
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        sorted.foldLeft(List.empty[Streams.Session]) { (acc, e) =>
          acc match {
            case h :: tl
              if e.ts.getTime - h.end.getTime <= 30 * 60000L =>
              h.copy(n_events = h.n_events + 1, total = h.total + e.value,
                end = e.ts) :: tl
            case _ =>
              Streams.Session(uid, 1, e.value, e.ts, e.ts,
                closed = false) :: acc
          }
        }
    }.collect()
    val u7 = sessions.filter(_.user_id == 7L).sortBy(_.start.getTime)
    u7.length shouldBe 2
    u7(0).n_events shouldBe 2
    u7(0).total shouldBe 3.0
    u7(1).n_events shouldBe 1
    sessions.count(_.user_id == 9L) shouldBe 1
  }

  test("sliding counts match batch for closed windows (w4's streaming twin)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = Files.createTempDirectory("slide").toFile.getAbsolutePath
    val src = spark.read.parquet(s"$sf0001/events.parquet")
    val ev = graft.util.Timestamps.normalizeEventTs(src, "ts")
    ev.write.parquet(s"$dir/src")
    val q = Streams.slidingCounts(
      Streams.eventStream(spark, s"$dir/src"),
      col("event_type") === "error")
      .writeStream.format("memory").queryName("slide_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val streamed = spark.sql("SELECT * FROM slide_out")
      val batch = ev
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
        .agg(count(when(col("event_type") === "error", lit(1)))
          .as("n_match"))
        .select(col("window.start").as("ws"), col("user_id"),
          col("n_match"))
      // append emits only watermark-closed windows — a subset of batch,
      // but every emitted row must agree exactly
      val joined = streamed.alias("s").join(batch.alias("b"),
        Seq("ws", "user_id"))
      joined.count() shouldBe streamed.count()
      joined.filter(col("s.n_match") =!= col("b.n_match"))
        .count() shouldBe 0
      streamed.count() should be > 0L
      // sliding windows: multiple slide starts per hour must appear
      streamed.select(countDistinct(col("ws"))).first().getLong(0) should
        be > 4L
    } finally gracefulStop(q)
  }

  test("sessionize runs as a real mapGroupsWithState streaming query") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[Streams.Event]
    input.addData(
      Streams.Event(1, t(0), 7L, "click", 1.0),
      Streams.Event(2, t(10), 7L, "click", 2.0),
      Streams.Event(3, t(100), 7L, "click", 4.0), // > 30 min gap
      Streams.Event(4, t(5), 9L, "view", 8.0))
    val q = Streams.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val out = spark.sql("SELECT * FROM sessions_out").as[Streams.Session]
        .collect()
      // the gap-crossing event must EMIT the completed first session
      // (the mapGroupsWithState formulation silently dropped it)
      val u7 = out.filter(_.user_id == 7L)
      u7.length shouldBe 1
      u7.head.n_events shouldBe 2
      u7.head.total shouldBe 3.0
      u7.head.closed shouldBe true
      // open sessions (u9, and u7's second) stay in state, not emitted
      out.exists(_.user_id == 9L) shouldBe false
    } finally gracefulStop(q) // a live query would keep firing micro-
                              // batches (and logging errors) through
                              // every later suite
  }

  test("streaming dedup drops cross-batch fingerprint re-arrivals") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[(Long, Timestamp, String)]
    // ids 1/3 share a fingerprint (case/whitespace-normalized dup),
    // id 4 repeats id 2 verbatim in a later batch, and id 6 repeats the
    // fox line with a DECOMPOSED e+U+0301 where id 1 had precomposed
    // U+00E9 — the NFC-first fingerprint (same keying as batch d1) must
    // merge them across batches too
    input.addData((1L, t(0), "The quick brown fox caf\u00e9"),
      (2L, t(1), "an unrelated document"))
    input.addData((3L, t(2), "the  QUICK brown fox caf\u00e9"),
      (4L, t(3), "an unrelated document"),
      (5L, t(4), "a genuinely new document"),
      (6L, t(5), "The quick brown fox cafe\u0301"))
    val q = Streams.dedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "text", "ts")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val ids = spark.sql("SELECT doc_id FROM dedup_out")
        .collect().map(_.getLong(0)).sorted
      ids shouldBe Array(1L, 2L, 5L)
    } finally gracefulStop(q)
  }

  test("streaming decontaminate drops shingle-sharing docs statelessly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    val benchmark = Seq(
      (900L, "the famous benchmark question about ancient rome"),
      (901L, "compute the sum of the first hundred primes")).toDF(
      "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    input.addData(
      (1L, "a clean training document about cooking pasta dishes"),
      // contains benchmark 901's 5-gram "sum of the first hundred"
      (2L, "please compute the sum of the first hundred primes quickly"),
      (3L, "another clean document mentioning rome only briefly"))
    val q = Streams.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), benchmark, "text")
      .writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val ids = spark.sql("SELECT doc_id FROM decon_out")
        .collect().map(_.getLong(0)).sorted
      ids shouldBe Array(1L, 3L)
    } finally gracefulStop(q)
    // batch parity: the same filter on a batch frame keeps exactly the
    // ids the exact batch pass keeps (no false positives at fpp=1e-6 on
    // this data; bloom build is deterministic, so this is a stable check)
    val docs = Seq(
      (1L, "a clean training document about cooking pasta dishes"),
      (2L, "please compute the sum of the first hundred primes quickly"),
      (3L, "another clean document mentioning rome only briefly"),
      (4L, null.asInstanceOf[String]), // null text: KEPT, like the batch pass
      (5L, "too short"))               // < n tokens: cannot be contaminated
      .toDF("doc_id", "text")
    val streamFilter = Streams.decontaminateStream(docs, benchmark, "text")
      .collect().map(_.getLong(0)).sorted
    val exactBatch = graft.dedup.Dedup.decontaminate(
      docs, benchmark, "doc_id", "text")
      .collect().map(_.getLong(0)).sorted
    streamFilter shouldBe exactBatch
  }

  test("c4 line filters compose onto a stream statelessly: streamed " +
    "output equals the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    val pages = Seq(
      (1L, "A good long prose line with enough words to survive here.\n" +
        "short.\nAnother surviving sentence that ends with a period."),
      (2L, "no terminal punctuation on this single long line of text"),
      (3L, "Please enable javascript to read the following comments."))
    val input = MemoryStream[(Long, String)]
    input.addData(pages: _*)
    val q = graft.text.TextAnalysis.c4LineFilters(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("c4_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val got = spark.sql("SELECT doc_id, n_lines_kept FROM c4_out")
        .collect()
        .map(r => r.getAs[Number]("doc_id").longValue ->
          r.getAs[Number]("n_lines_kept").longValue).toMap
      got shouldBe Map(1L -> 2L) // 2 and 3 empty out entirely
      val batch = graft.text.TextAnalysis.c4LineFilters(
        pages.toDF("doc_id", "text"), "doc_id", "text")
        .collect()
        .map(r => r.getAs[Number]("doc_id").longValue ->
          r.getAs[Number]("n_lines_kept").longValue).toMap
      got shouldBe batch
    } finally gracefulStop(q)
  }

  test("blocklist + Gopher filters compose onto a stream statelessly: " +
    "streamed survivors equal each batch operator (t13/t14/t15/t16)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batchDf = docs.toDF("doc_id", "text")
    def drive(name: String,
              f: org.apache.spark.sql.DataFrame =>
                org.apache.spark.sql.DataFrame): Set[Long] = {
      val input = MemoryStream[(Long, String)]
      input.addData(docs: _*)
      val q = f(input.toDF().toDF("doc_id", "text"))
        .select("doc_id")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      try {
        val done = q.awaitTermination(120000)
        q.exception.foreach(e => fail(s"stream $name failed: $e"))
        if (!done) {
          info(s"$name still active after 120s: status=${q.status}")
          q.recentProgress.foreach(p =>
            info(s"$name batch ${p.batchId}: in=${p.numInputRows} " +
              s"dur=${p.durationMs}"))
        }
        spark.sql(s"SELECT doc_id FROM $name").collect()
          .map(_.getAs[Number]("doc_id").longValue).toSet
      } finally gracefulStop(q)
    }
    // t13 blocklist (map-only since r14 — no anti-join to state-block)
    val t13 = (d: org.apache.spark.sql.DataFrame) =>
      graft.text.TextAnalysis.dropFlagged(d, "doc_id", "text",
        Seq("table", "key"), maxPerMille = 60L)
    // t14 Gopher format keep (inlined per-row predicate)
    val t14 = (d: org.apache.spark.sql.DataFrame) =>
      graft.text.TextAnalysis.gopherDropLowQuality(d, "text",
        minWords = 20L, maxWords = 100000L, minStopHits = 1L)
    // t15 repetition keep via the in-row expression
    val t15 = (d: org.apache.spark.sql.DataFrame) =>
      d.filter(graft.text.TextAnalysis.gopherRepetitionKeep(col("text")))
    // t16 composite = format ∧ repetition, both per-row
    val t16 = (d: org.apache.spark.sql.DataFrame) => t15(t14(d))
    drive("t13_out", t13) shouldBe
      t13(batchDf).collect().map(_.getLong(0)).toSet
    drive("t14_out", t14) shouldBe
      t14(batchDf).collect().map(_.getLong(0)).toSet
    val t15Stream = drive("t15_out", t15)
    t15Stream shouldBe graft.text.TextAnalysis
      .gopherRepetitionStats(batchDf, "doc_id", "text")
      .filter(col("keep") === 1L).collect().map(_.getLong(0)).toSet
    // the composite twin must also equal the BATCH gopherFilter (one
    // map-only filter sharing the same native expression since r14)
    drive("t16_out", t16) shouldBe graft.text.TextAnalysis
      .gopherFilter(batchDf, "doc_id", "text",
        minWords = 20L, minStopHits = 1L)
      .collect().map(_.getLong(0)).toSet
    // d22 within-doc sentence dedup is also map-only → streams as-is
    // (survivor-id comparison; the rebuild itself is pinned in DedupSpec)
    val d22 = (d: org.apache.spark.sql.DataFrame) =>
      graft.dedup.Dedup.dropRepeatedSentencesWithin(d, "doc_id", "text")
        .select(col("doc_id"), col("text_kept").as("text"))
    drive("d22_out", d22) shouldBe
      d22(batchDf).collect().map(_.getLong(0)).toSet
  }

  test("DSIR scoring composes onto a stream: map-only scoreAgainst a " +
    "frozen λ table gives each streamed doc its batch weight (t18) — " +
    "END-TO-END ON A FILE STREAM (the per-crawl production shape: new " +
    "parquet lands in a directory, scores with zero recompute)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val raw = docs.filter(col("source") =!= "src0")
    val target = docs.filter(col("source") === "src0")
    val lam = graft.analytics.Dsir
      .bucketScores(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the "new crawl" arrives as parquet files in a watched directory
    val crawlPath = java.nio.file.Files
      .createTempDirectory("graft_dsir_crawl")
    val crawlDir = crawlPath.toString
    raw.select("doc_id", "text").write.mode("overwrite").parquet(crawlDir)
    val streamIn = spark.readStream
      .schema("doc_id LONG, text STRING")
      .parquet(crawlDir)
    val q = graft.analytics.Dsir.scoreAgainst(
        streamIn, "doc_id", "text",
        lam, lamDefault = 0L, buckets = 256)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(120000)
      q.exception.foreach(e => fail(s"dsir stream failed: $e"))
      val streamed = spark.sql(
          "SELECT doc_id, weight_bits FROM dsir_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.analytics.Dsir
        .importanceWeights(raw, target, "doc_id", "text", 256)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("weight_bits")).toMap
      streamed shouldBe batch
    } finally {
      gracefulStop(q)
      // the watched crawl dir holds a parquet copy of the fixture —
      // delete it so repeated suite runs don't accumulate under /tmp
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(crawlPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("KMV store absorbs a micro-batched stream: after three batches " +
    "the store equals the batch sketch of everything seen (m19's " +
    "ingest loop, streamed via foreachBatch)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val chunks = Seq(
      (1 to 400).map(i => ("a", s"x$i")) ++ (1 to 100).map(i => ("b", s"y$i")),
      (300 to 700).map(i => ("a", s"x$i")),
      (1 to 500).map(i => ("b", s"y$i")))
    var store = Seq.empty[(String, Long)].toDF("source", "h")
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("source", "sh")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        store = graft.analytics.Sketches.kmvMerge(store,
          graft.analytics.Sketches.kmvSketch(batch, "source", "sh", 64),
          64).localCheckpoint()
      }
      .start()
    try {
      chunks.foreach { c =>
        input.addData(c: _*)
        q.processAllAvailable()
      }
      val whole = graft.analytics.Sketches.kmvSketch(
        chunks.flatten.toDF("source", "sh"), "source", "sh", 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      store.collect().map(r => (r.getString(0), r.getLong(1)))
        .sorted.toSeq shouldBe whole
    } finally gracefulStop(q)
  }

  test("contamination-threshold drop composes onto a stream: per-batch " +
    "dropContaminatedDocs against a static benchmark keeps exactly the " +
    "batch pass's rows (d28's crawl-ingest form — the gate is " +
    "benchmark-side only, so the op is per-doc stateless)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val bench = Seq((900L,
      "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12")).toDF("doc_id", "text")
    val own = (1 to 12).map(i => s"o$i").mkString(" ")
    val batches = Seq(
      Seq( // frac 1.0 (dropped) alongside a clean doc
        (1L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"),
        (4L, "entirely original words with no benchmark overlap at all")),
      Seq( // frac 0.5 (dropped at 0.49) and frac 0.25 (kept)
        (2L, s"b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 $own"),
        (3L, s"b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 $own " +
          (13 to 36).map(i => s"o$i").mkString(" "))))
    var kept = Seq.empty[(Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept = kept ++ graft.dedup.Dedup.dropContaminatedDocs(
            batch, bench, "doc_id", "text", maxFrac = 0.49,
            minLen = 12, seedN = 5)
          .collect().map(r => (r.getLong(0), r.getString(1)))
      }
      .start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val whole = graft.dedup.Dedup.dropContaminatedDocs(
          batches.flatten.toDF("doc_id", "text"), bench, "doc_id",
          "text", maxFrac = 0.49, minLen = 12, seedN = 5)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      kept.sorted shouldBe whole
      kept.map(_._1).sorted shouldBe Seq(3L, 4L) // 1 and 2 dropped
    } finally gracefulStop(q)
  }

  test("quantile store absorbs a micro-batched stream: after three " +
    "batches the persisted table equals the batch sketch of everything " +
    "seen (m21's ingest loop, streamed via foreachBatch against the " +
    "catalog table)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val k = 16
    val tbl = "graft_qskstore_stream"
    val base = (1L to 50L).map(i => ("a", i, i * 3.0)) ++
      (1L to 30L).map(i => ("b", i, i * 7.0))
    val chunks = Seq(
      (51L to 120L).map(i => ("a", i, i * 3.0)),
      (31L to 90L).map(i => ("b", i, i * 7.0)),
      (121L to 200L).map(i => ("a", i, i * 3.0)))
    try {
      graft.analytics.Sketches.writeQuantileStore(
        base.toDF("source", "id", "v"), "source", "id", "v", k, tbl,
        "/tmp/graft_test_sinks/qskstore_stream")
      val input = MemoryStream[(String, Long, Double)]
      val q = input.toDF().toDF("source", "id", "v")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.analytics.Sketches.absorbIntoQuantileStore(
            batch, "source", "id", "v", k, tbl)
        }
        .start()
      try {
        chunks.foreach { c =>
          input.addData(c: _*)
          q.processAllAvailable()
        }
        val whole = graft.analytics.Sketches.quantileSketch(
          (base ++ chunks.flatten).toDF("source", "id", "v"),
          "source", "id", "v", k)
          .collect().map(r => (r.getString(0), r.getLong(1),
            r.getDouble(2))).sorted.toSeq
        spark.table(tbl).collect().map(r => (r.getString(0),
          r.getLong(1), r.getDouble(2))).sorted.toSeq shouldBe whole
      } finally gracefulStop(q)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("IVF index SERVES a micro-batched query stream (n13's batch " +
    "search via foreachBatch): per-batch keyed top-k over the static " +
    "index — accumulated results equal one batch call on all queries") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val path = "/tmp/graft_test_sinks/stream_ivfserve"
    val outDir = s"$path/results"
    // the results sink APPENDS per micro-batch — clear the whole tree
    // so repeated suite runs don't accumulate stale rows
    org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    def vec(i: Long): Array[Float] =
      Array.tabulate(8)(d => math.cos(0.41 * i * (d + 1)).toFloat)
    val corpus = (0L until 60L).map(i => (i, vec(i)))
    graft.similarity.Ann.writeIvfIndex(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      nCentroids = 4, s"$path/index")
    // queries arrive as a stream, in batches — each micro-batch runs
    // the KEYED search (one plan per trigger, never per query row)
    val queryIds = Seq(Seq(100L, 101L), Seq(102L, 103L, 104L))
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("qid", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.similarity.Ann.ivfTopKPerQuery(spark, s"$path/index",
            "vec_id", "embedding", batch, "qid", "embedding",
            k = 5, nProbe = 2)
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      queryIds.foreach { ids =>
        input.addData(ids.map(i => (i, vec(i))): _*)
        q.processAllAvailable()
      }
      val streamed = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val oneCall = graft.similarity.Ann.ivfTopKPerQuery(spark,
          s"$path/index", "vec_id", "embedding",
          queryIds.flatten.map(i => (i, vec(i)))
            .toDF("qid", "embedding"), "qid", "embedding",
          k = 5, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      streamed shouldBe oneCall
      streamed.map(_._1) shouldBe queryIds.flatten.toSet // every query
    } finally gracefulStop(q)
  }

  test("IVF index absorbs a micro-batched embedding stream (n11's " +
    "ingest loop via foreachBatch, with a replayed batch): the served " +
    "index equals the one-pass batch build at the same parameters") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val path = "/tmp/graft_test_sinks/stream_ivfinc"
    def vec(i: Long): Array[Float] =
      Array.tabulate(8)(d => math.cos(0.37 * i * (d + 1)).toFloat)
    val all = (0L until 60L).map(i => (i, vec(i)))
    val init = all.filter(_._1 < 20)
    // REPLAYED middle batch = the at-least-once delivery a streaming
    // sink must survive; absorb's anti-join makes it a no-op
    val batches = Seq(all.filter(t => t._1 >= 20 && t._1 < 40),
      all.filter(_._1 >= 40), all.filter(t => t._1 >= 20 && t._1 < 40))
    graft.similarity.Ann.writeIvfIndex(init.toDF("vec_id", "embedding"),
      "vec_id", "embedding", nCentroids = 4, path)
    val input = MemoryStream[(Long, Array[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.similarity.Ann.absorbIvfIndex(spark, path, batch,
          "vec_id", "embedding")
      }
      .start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      spark.read.parquet(s"$path/cells").count() shouldBe 60L
      // the batch build derives centroids from the 4 lowest ids, all of
      // which sit in the initial slice — so pinned == derived and the
      // served index must answer exactly like the one-pass path
      val query = Seq(Tuple1(vec(45L))).toDF("qe")
      val served = graft.similarity.Ann.ivfTopKFromIndex(spark, path,
          "vec_id", "embedding", query, "qe", k = 5, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val onePass = graft.similarity.Ann.ivfTopK(
          all.toDF("vec_id", "embedding"), "vec_id", "embedding",
          query, "qe", k = 5, nCentroids = 4, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      served shouldBe onePass
      served.head._1 shouldBe 45L // the streamed-in vector finds itself
    } finally gracefulStop(q)
  }

  test("substring store absorbs a micro-batched crawl: each batch is " +
    "deduped against the store then absorbed (d25's ingest loop via " +
    "foreachBatch) — kept rows over all batches equal the batch " +
    "dropDupSubstrings over everything seen") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val pfx = "graft_stream_substore"
    val path = "/tmp/graft_test_sinks/stream_substore"
    // batch 1: a fresh doc; batch 2: a dup of batch 1's span + a clean
    // doc; batch 3: a dup of the ORIGINAL store span (store memory)
    val storeDocs = Seq(1L -> "alpha beta gamma delta epsilon zeta")
    val batches = Seq(
      Seq(10L -> "xx1 xx2 rr1 rr2 rr3 rr4 rr5 rr6"),
      Seq(20L -> "rr1 rr2 rr3 rr4 rr5 rr6 yy1",
          21L -> "a completely unrelated document with fresh words"),
      Seq(30L -> "pre alpha beta gamma delta epsilon zeta post"))
    spark.sql(s"DROP TABLE IF EXISTS ${pfx}_seeds")
    graft.dedup.Dedup.writeSubstringStore(storeDocs.toDF("doc_id", "text"),
      "doc_id", "text", pfx, path, seedN = 3)
    val kept = scala.collection.mutable.Map.empty[Long, String]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.dedup.Dedup.dedupSubstringShardAgainst(batch, "doc_id",
              "text", pfx, minLen = 6, seedN = 3)
            .collect().foreach(r =>
              kept(r.getAs[Long]("doc_id")) = r.getAs[String]("text_kept"))
          // absorb the ORIGINAL batch (the d25 scaladoc contract)
          graft.dedup.Dedup.absorbIntoSubstringStore(batch, "doc_id",
            "text", pfx, seedN = 3)
        }
      }
      .start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val all = (storeDocs ++ batches.flatten).toDF("doc_id", "text")
      val whole = graft.dedup.Dedup.dropDupSubstrings(all, "doc_id",
          "text", minLen = 6, seedN = 3)
        .filter(col("doc_id") >= 10L)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_kept"))
        .toMap
      kept.toMap shouldBe whole
      // and the loop genuinely excised: 20 lost its rr-run to 10, 30
      // its middle to the original store doc
      kept(20L) shouldBe "yy1"
      kept(30L) shouldBe "pre post"
    } finally {
      gracefulStop(q)
      spark.sql(s"DROP TABLE IF EXISTS ${pfx}_seeds")
    }
  }

  test("substring store ingest runs END-TO-END ON A FILE STREAM: " +
    "parquet shards land in a watched directory one at a time, each " +
    "micro-batch dedups against the store then absorbs (d25's " +
    "production loop via the real file source) — kept rows equal the " +
    "batch dropDupSubstrings over everything seen") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val pfx = "graft_fstream_substore"
    val sinkPath = "/tmp/graft_test_sinks/fstream_substore"
    val watchedPath = java.nio.file.Files
      .createTempDirectory("graft_substore_crawl")
    val watched = watchedPath.toString
    val storeDocs = Seq(1L -> "alpha beta gamma delta epsilon zeta")
    // same shard shapes as the MemoryStream twin above: a fresh doc, a
    // dup of its span, a clean doc, a dup of the ORIGINAL store span
    val shards = Seq(
      Seq(10L -> "xx1 xx2 rr1 rr2 rr3 rr4 rr5 rr6"),
      Seq(20L -> "rr1 rr2 rr3 rr4 rr5 rr6 yy1",
          21L -> "a completely unrelated document with fresh words"),
      Seq(30L -> "pre alpha beta gamma delta epsilon zeta post"))
    spark.sql(s"DROP TABLE IF EXISTS ${pfx}_seeds")
    graft.dedup.Dedup.writeSubstringStore(storeDocs.toDF("doc_id", "text"),
      "doc_id", "text", pfx, sinkPath, seedN = 3)
    // land each shard as ONE parquet file in the watched dir (write to
    // a scratch dir, move the part file in atomically — the file
    // source's own discovery contract)
    def landShard(i: Int, docs: Seq[(Long, String)]): Unit = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_shard_stage$i").toString
      docs.toDF("doc_id", "text").coalesce(1).write
        .mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(watched, s"shard$i.parquet"))
    }
    val kept = scala.collection.mutable.Map.empty[Long, String]
    val streamIn = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1) // one shard per micro-batch
      .parquet(watched)
    val q = streamIn.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.dedup.Dedup.dedupSubstringShardAgainst(batch, "doc_id",
              "text", pfx, minLen = 6, seedN = 3)
            .collect().foreach(r =>
              kept(r.getAs[Long]("doc_id")) = r.getAs[String]("text_kept"))
          graft.dedup.Dedup.absorbIntoSubstringStore(batch, "doc_id",
            "text", pfx, seedN = 3)
        }
      }
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      shards.zipWithIndex.foreach { case (docs, i) =>
        landShard(i, docs)
        q.processAllAvailable()
      }
      q.exception.foreach(e => fail(s"file stream failed: $e"))
      val all = (storeDocs ++ shards.flatten).toDF("doc_id", "text")
      val whole = graft.dedup.Dedup.dropDupSubstrings(all, "doc_id",
          "text", minLen = 6, seedN = 3)
        .filter(col("doc_id") >= 10L)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_kept"))
        .toMap
      kept.toMap shouldBe whole
      kept(20L) shouldBe "yy1"       // lost its rr-run to shard 1's doc
      kept(30L) shouldBe "pre post"  // lost its middle to the store doc
    } finally {
      gracefulStop(q)
      spark.sql(s"DROP TABLE IF EXISTS ${pfx}_seeds")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(watchedPath).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("stream-stream interval join pairs within the lookback, across " +
    "batches (j5's streaming twin)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val lefts = MemoryStream[(Long, Timestamp, Long)]
    val rights = MemoryStream[(Long, Timestamp, Long)]
    // right rows arrive in an EARLIER batch than the left they match —
    // the state store must hold them across the batch boundary
    rights.addData((10L, t(20), 7L), (11L, t(35), 7L), (12L, t(60), 7L))
    lefts.addData((1L, t(60), 7L), (2L, t(10), 9L))
    val q = Streams.intervalJoinStream(
      lefts.toDF().toDF("l_id", "ts", "user_id"),
      rights.toDF().toDF("rid", "ts", "user_id"),
      "user_id", "ts", lookback = "30 minutes")
      .select("l_id", "r_rid")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val pairs = spark.sql("SELECT l_id, r_rid FROM ij_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      // l@60 matches views at 35 and 60 (inclusive ends); 20 is outside
      // [30, 60]; user 9 has no views at all
      pairs.toSeq shouldBe Seq((1L, 11L), (1L, 12L))
    } finally gracefulStop(q)
  }

  test("chunking-on-ingest: chunkTokens is stateless and runs unchanged " +
    "on a stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    input.addData((1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, ""))
    val q = graft.text.TextAnalysis.chunkTokens(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      window = 4, stride = 3)
      .writeStream.format("memory").queryName("chunk_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val out = spark.sql("SELECT doc_id, chunk_idx, chunk FROM chunk_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(x => (x._1, x._2))
      out.length shouldBe 4 // doc 1 only; the empty doc emits nothing
      out.head._3 shouldBe "w1 w2 w3 w4"
      out.last._3 shouldBe "w10"
    } finally gracefulStop(q)
  }

  test("stream-static enrichment: broadcast dim tags the stream, misses " +
    "pass through as nulls") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    val dim = spark.read.parquet(s"$sf0001/nation.parquet")
      .select(col("n_nationkey").as("key"), col("n_name"))
    val input = MemoryStream[(Long, Long)]
    input.addData((1L, 0L), (2L, 3L), (3L, 9999L)) // 9999: no dim row
    val q = Streams.enrichStream(
      input.toDF().toDF("event_id", "key"), dim, Seq("key"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val out = spark.sql("SELECT event_id, n_name FROM enrich_out")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1)))
        .sortBy(_._1)
      out.length shouldBe 3
      out(0)._2.isDefined shouldBe true
      out(1)._2.isDefined shouldBe true
      out(2)._2 shouldBe None // left join keeps the miss, null-tagged
    } finally gracefulStop(q)
  }

  test("streaming latest-wins: newer versions replace, late ones absorb, " +
    "ties break like batch keepLatest") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sc = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[Streams.Version]
    val q = Streams.latestWinsStream(input.toDS())
      .writeStream.format("memory").queryName("lw_out")
      .outputMode(OutputMode.Update())
      .start()
    try {
      input.addData(Streams.Version(7L, t(1), 101L, 1.0),
        Streams.Version(7L, t(5), 102L, 2.0), // same batch: newest wins
        Streams.Version(9L, t(2), 103L, 9.0))
      q.processAllAvailable()
      input.addData(Streams.Version(7L, t(3), 104L, 3.0)) // late: absorbed
      q.processAllAvailable()
      input.addData(Streams.Version(9L, t(2), 105L, 8.0)) // ts tie: id wins
      q.processAllAvailable()
      val hist = spark.sql("SELECT key, event_id, value FROM lw_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // batch 1 emitted (7,102) and (9,103); batch 2 emitted nothing for
      // key 7 (late row older than held state); batch 3 re-emitted key 9
      hist.count(_._1 == 7L) shouldBe 1
      hist.filter(_._1 == 7L).head shouldBe ((7L, 102L, 2.0))
      hist.filter(_._1 == 9L).map(x => (x._2, x._3)).toSet shouldBe
        Set((103L, 9.0), (105L, 8.0))
      // final compacted view = latest per key, identical to what batch
      // keepLatest over the full log yields
      val compacted = hist.groupBy(_._1) // memory sink keeps per-batch rows
      compacted(9L).last shouldBe ((9L, 105L, 8.0))
    } finally gracefulStop(q)
  }

  test("cross-batch out-of-order event does not split the session") {
    // drives the shared mergeEvent step (the exact code the streaming
    // state function folds with) in cross-batch arrival order
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val gapMs = 30 * 60000L
    def ev(id: Long, min: Int) = Streams.Event(id, t(min), 7L, "c", 1.0)
    var open: Option[Streams.Session] = None
    var emitted = List.empty[Streams.Session]
    // batch 1: t0, t10; batch 2: late t5; batch 3: t39 (29 min after t10)
    Seq(ev(1, 0), ev(2, 10), ev(3, 5), ev(4, 39)).foreach { e =>
      val (next, closed) = Streams.mergeEvent(7L, open, e, gapMs)
      closed.foreach(c => emitted ::= c)
      open = Some(next)
    }
    // before the fix the late t5 regressed end to t5, so t39 (34 min
    // later) falsely closed the session; with max() no session closes
    emitted shouldBe empty
    open.get.n_events shouldBe 4
    open.get.end shouldBe t(39)
    open.get.start shouldBe t(0)
  }

  test("streaming funnel ≡ batch stage fold, with out-of-order arrivals " +
    "and a ts tie (w6's streaming twin)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[Streams.Event]
    // u1 converts fully; u2's click arrives LATE (batch 2) with an
    // EARLIER ts than its purchase — only the buffered fold gets this
    // right; u3 has a ts TIE where event_id order decides (view id 30
    // before click id 31 at the same instant → stage 2); u4 never views
    input.addData(
      Streams.Event(10, t(0), 1L, "view", 1.0),
      Streams.Event(11, t(1), 1L, "click", 1.0),
      Streams.Event(12, t(2), 1L, "purchase", 1.0),
      Streams.Event(20, t(0), 2L, "view", 1.0),
      Streams.Event(22, t(4), 2L, "purchase", 1.0),
      Streams.Event(30, t(5), 3L, "view", 1.0),
      Streams.Event(31, t(5), 3L, "click", 1.0),
      Streams.Event(40, t(1), 4L, "click", 1.0))
    input.addData( // late, out of order: ts before u2's purchase
      Streams.Event(21, t(2), 2L, "click", 1.0))
    input.addData( // watermark push: 30 min delay + margin past t(5)
      Streams.Event(99, t(120), 9L, "view", 1.0))
    val q = Streams.funnelStages(input.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val out = spark.sql("SELECT * FROM funnel_out")
        .as[Streams.FunnelStage].collect()
        .groupBy(_.user_id).map { case (u, fs) =>
          u -> fs.map(_.stage).max } // emissions are monotone: max = last
      out.get(1L) shouldBe Some(3)
      out.get(2L) shouldBe Some(3) // late click still completes the chain
      out.get(3L) shouldBe Some(2) // tie resolved by event_id, like batch
      out.get(4L) shouldBe Some(0) // click without view never advances
      out.get(9L) shouldBe None    // watermark hasn't passed the sentinel
      // and the exact batch twin (the w6 fold) agrees on every user
      val batch = Seq(
        (1L, Seq((0, 10L, "view"), (1, 11L, "click"), (2, 12L, "purchase"))),
        (2L, Seq((0, 20L, "view"), (2, 21L, "click"), (4, 22L, "purchase"))),
        (3L, Seq((5, 30L, "view"), (5, 31L, "click"))),
        (4L, Seq((1, 40L, "click")))
      ).map { case (u, evs) =>
        val stage = evs.sortBy(e => (e._1, e._2)).foldLeft(0) { (st, e) =>
          (st, e._3) match {
            case (0, "view") => 1
            case (1, "click") => 2
            case (2, "purchase") => 3
            case _ => st
          }
        }
        u -> stage
      }.toMap
      batch.foreach { case (u, s) => out(u) shouldBe s }
    } finally gracefulStop(q)
  }

  test("streaming funnel carries the stage ACROSS quiet periods: a user " +
    "who converts after an emission reaches the batch stage, not a " +
    "restarted machine") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sc = spark.sqlContext
    def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val input = MemoryStream[Streams.Event]
    // u5 views, goes quiet long enough to EMIT stage 1, then clicks and
    // purchases — the second emission must be 3 (cumulative), not 2-
    // from-zero or a restart. The batches are fed interactively with
    // processAllAvailable between them: AvailableNow drains every
    // pending addData block in ONE micro-batch, which collapses the
    // quiet periods this test exists to exercise.
    val q = Streams.funnelStages(input.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("funnel_cum_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def feed(evs: Streams.Event*): Unit = {
        input.addData(evs: _*); q.processAllAvailable()
      }
      feed(Streams.Event(50, t(0), 5L, "view", 1.0))
      feed(Streams.Event(80, t(45), 8L, "view", 1.0)) // wm→t(15)
      feed(Streams.Event(81, t(50), 8L, "view", 1.0)) // u5 emits stage 1
      feed(Streams.Event(51, t(60), 5L, "click", 1.0),
        Streams.Event(52, t(61), 5L, "purchase", 1.0))
      feed(Streams.Event(99, t(120), 9L, "view", 1.0)) // wm→t(90)
      feed(Streams.Event(100, t(240), 9L, "view", 1.0)) // flush timers
      val u5 = spark.sql("SELECT * FROM funnel_cum_out")
        .as[Streams.FunnelStage].collect()
        .filter(_.user_id == 5L).map(_.stage)
      // two quiet periods → two monotone emissions, final = batch fold
      u5.sorted shouldBe u5 // never regresses
      u5.last shouldBe 3
      u5.head shouldBe 1
    } finally gracefulStop(q)
  }

  test("streaming partitioned parquet sink: hive layout + exactly-once " +
    "across restarts (k7's streaming twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = Files.createTempDirectory("stream_part_sink").toString
    val ckpt = Files.createTempDirectory("stream_part_ckpt").toString
    def runOnce(): Unit = {
      val q = input.toDF().toDF("doc_id", "source")
        .writeStream.format("parquet")
        .partitionBy("source")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); gracefulStop(q)
    }
    input.addData((1L, "sA"), (2L, "sB"), (3L, "sA"))
    runOnce()
    // restart from the same checkpoint: only NEW data lands (the file
    // sink's transaction log makes reprocessing idempotent)
    input.addData((4L, "sB"))
    runOnce()
    val back = spark.read.parquet(out)
    back.count() shouldBe 4
    // hive directory layout, readable with partition pruning
    new java.io.File(out).listFiles().map(_.getName).filter(
      _.startsWith("source=")).sorted shouldBe Array(
      "source=sA", "source=sB")
    back.filter(col("source") === "sA").select("doc_id")
      .as[Long].collect().sorted shouldBe Array(1L, 3L)
    back.filter(col("source") === "sB").select("doc_id")
      .as[Long].collect().sorted shouldBe Array(2L, 4L)
  }
}
