package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (extension beyond the reference, which is
  * batch-only — SURVEY.md §2.11 flags incremental resume as the closest
  * analog). Demonstrated over the `events` table shape: a file stream with
  * watermarked tumbling-window aggregation, and stateful sessionization via
  * `mapGroupsWithState`.
  *
  * Scale design: windowed agg is partial-aggregated before the shuffle on
  * (window, event_type); state is partitioned by user_id — both scale
  * horizontally, and `Trigger.AvailableNow` gives batch-equivalent
  * backfill semantics over historical data.
  */
object Streams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long, total: Double,
                           start: Timestamp, end: Timestamp,
                           closed: Boolean)

  /** Open a file stream over event parquet files (schema pinned from a
    * batch peek — file streams require explicit schema). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    graft.util.Timestamps.normalizeEventTs(raw, "ts")
  }

  /** Watermarked tumbling-window count/sum per event_type. */
  def windowedCounts(events: DataFrame,
                     window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(24,6)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Stateful sessionization: events within `gapMinutes` of each other
    * belong to one session per user. Gap-crossing events EMIT the
    * completed session (closed=true) and open a new one — hence
    * `flatMapGroupsWithState`, which can emit zero-or-many sessions per
    * group per batch (a `mapGroupsWithState` fold would silently drop
    * every session but the last). The open session lives in state and is
    * emitted closed on EVENT-TIME timeout: once the watermark passes
    * `session end + gap`, no event can extend it.
    *
    * Why event-time (not processing-time) timeouts: they are driven by
    * the data's own clock, so a backfill replay emits byte-identical
    * sessions regardless of wall-clock speed — and a `ProcessingTimeTimeout`
    * query NEVER goes idle (every micro-batch re-registers wall-clock
    * timers, so the engine keeps firing empty batches to check them —
    * measured 50+ empty batches in 12 s under `AvailableNow`, which is
    * also why such a query never self-terminates). */
  /** Pure per-event merge step shared by the streaming state function and
    * tests: returns (new open session, optionally emitted closed session).
    * Out-of-order safe: a late event must not regress the session end (or
    * a subsequent in-gap event would be falsely split off); start likewise
    * only moves earlier. */
  def mergeEvent(uid: Long, open: Option[Session], e: Event,
                 gapMs: Long): (Session, Option[Session]) =
    open match {
      case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
        (s.copy(n_events = s.n_events + 1, total = s.total + e.value,
          start = if (e.ts.before(s.start)) e.ts else s.start,
          end = if (e.ts.after(s.end)) e.ts else s.end), None)
      case other => // gap crossed (emit old) or no session yet
        (Session(uid, 1, e.value, e.ts, e.ts, closed = false),
          other.map(_.copy(closed = true)))
    }

  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 watermarkDelay: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val s = state.get.copy(closed = true)
            state.remove()
            Iterator(s)
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val emitted = Seq.newBuilder[Session]
            evs.foreach { e =>
              val (next, closedOut) = mergeEvent(uid, open, e, gapMs)
              closedOut.foreach(emitted += _)
              open = Some(next)
            }
            open.foreach { s =>
              state.update(s)
              // close when the watermark passes end+gap; the timestamp
              // must sit strictly above the current watermark (a very
              // late session's deadline may already have passed)
              state.setTimeoutTimestamp(math.max(s.end.getTime + gapMs,
                state.getCurrentWatermarkMs() + 1))
            }
            emitted.result().iterator
          }
      }
  }

  /** Sliding-window per-user predicate count — the streaming twin of the
    * batch trailing RANGE window (query `w4_trailing_count`): every
    * `slide`, the count of matching events over the trailing `window_`
    * per user. Partial-aggregated before the shuffle on (window, user);
    * state is bounded by active-users × windows-per-horizon and evicted
    * as the watermark passes — it never grows with stream length. */
  def slidingCounts(events: DataFrame,
                    matchIf: org.apache.spark.sql.Column,
                    window_ : String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("user_id"))
      .agg(count(when(matchIf, lit(1))).as("n_match"))
      .select(col("window.start").as("ws"), col("user_id"),
        col("n_match"))

  /** Streaming exact-dedup (dedup-on-ingest): drop re-arrivals of the
    * same content fingerprint. `dropDuplicatesWithinWatermark` keys the
    * state store on the md5 fingerprint (same normalization as batch D1,
    * `TextAnalysis.fingerprint`) and — unlike plain `dropDuplicates` —
    * EVICTS entries once the watermark passes them, so state is bounded
    * by the dedup horizon instead of growing with the corpus forever.
    * Exactness within the horizon, at-most-once per fingerprint across
    * batches; duplicates older than the horizon are the batch near-dedup
    * pass's job. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.text.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming decontamination (filter-on-ingest): drop documents sharing
    * any word n-gram shingle with a STATIC benchmark table. Entirely
    * stateless — the benchmark collapses to a driver-built Bloom filter
    * shipped as a literal ([[graft.dedup.Dedup.shingleBloom]]), so the
    * stream side is a map-only filter: no state store, no shuffle, state
    * size zero regardless of how long the stream runs.
    *
    * Probabilistic in the conservative direction only: a bloom false
    * positive (rate `fpp`, default 1e-6) drops a CLEAN document;
    * contaminated documents are never kept. The exact batch pass
    * ([[graft.dedup.Dedup.decontaminate]]) remains the authority for
    * offline sweeps. Works identically on batch frames (the predicate is
    * an ordinary column). */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
                          textCol: String, shingleN: Int = 5,
                          fpp: Double = 1e-6): DataFrame = {
    val bloom = graft.dedup.Dedup.shingleBloom(
      benchmark, textCol, shingleN, fpp)
    docs.filter(!graft.dedup.Dedup.sharesShingle(
      bloom, col(textCol), shingleN))
  }

  /** Stream-stream interval join — the streaming twin of the batch
    * bucketed range join ([[graft.operators.Joins.rangeJoin]] / query
    * j5): all (left, right) pairs on `key` with `right.ts` in
    * `[left.ts - lookback, left.ts]`, both ends inclusive. Spark
    * buffers both sides in the state store; the watermarks plus the
    * BOTH-SIDED event-time range condition are what let it EVICT — a
    * right row can only match left rows up to `lookback` newer, so once
    * the watermark passes `r.ts + lookback` the row leaves state. State
    * is bounded by rate × (watermark delay + lookback), never by stream
    * length. Inner-join rows emit as soon as both sides arrive (the
    * watermark gates eviction, not emission). Right columns come back
    * `r_`-prefixed; `tsCol` must be an event-time TIMESTAMP on both
    * sides. */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         tsCol: String, lookback: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"r_$c"))
    left.withWatermark(tsCol, watermark)
      .join(r.withWatermark(s"r_$tsCol", watermark),
        col(key) === col(s"r_$key") &&
          col(s"r_$tsCol") >= col(tsCol) - expr(s"INTERVAL $lookback") &&
          col(s"r_$tsCol") <= col(tsCol))
  }

  /** One compacted (entity, field) version for [[latestWinsStream]]. */
  final case class Version(key: Long, ts: java.sql.Timestamp,
                           event_id: Long, value: Double)

  /** Streaming latest-wins compaction — the streaming twin of batch
    * [[graft.dedup.Dedup.keepLatest]] (query d11): state holds ONE row
    * per key (the newest by (ts, event_id) — same deterministic tie rule
    * as batch), and each micro-batch emits the keys whose newest version
    * CHANGED in that batch (Update-mode semantics via
    * flatMapGroupsWithState). Late rows older than the held version are
    * absorbed silently — exactly what replaying the log through batch
    * keepLatest would produce. State is one Version per live key:
    * bounded by entity cardinality, not log length (the correct bound
    * for a CDC keyspace; an event-time TTL would *evict live entities*,
    * which for compaction is data loss, not cleanup). */
  def latestWinsStream(versions: Dataset[Version]): Dataset[Version] = {
    import versions.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    def newer(a: Version, b: Version): Boolean =
      a.ts.getTime > b.ts.getTime ||
        (a.ts.getTime == b.ts.getTime && a.event_id > b.event_id)
    versions
      .groupByKey(_.key)
      .flatMapGroupsWithState[Version, Version](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Version], state: GroupState[Version]) =>
          val incoming = it.reduceOption((a, b) => if (newer(a, b)) a else b)
          val winner = (state.getOption, incoming) match {
            case (Some(held), Some(in)) if newer(in, held) => Some(in)
            case (None, in @ Some(_)) => in
            case _ => None // batch had nothing newer than held state
          }
          winner.foreach(state.update)
          winner.iterator
      }
  }

  /** A user's funnel stage as of the emission, from [[funnelStages]].
    * Emissions per user are monotone non-decreasing (the stage machine
    * only advances) — downstream takes the latest (= max) per user. */
  final case class FunnelStage(user_id: Long, stage: Int)

  /** Slim per-user funnel state: the cumulative stage, the newest event
    * ts seen (drives the quiet-period timeout), and the buffered events
    * the watermark has NOT yet finalized — (ts, event_id, type) only,
    * nothing the fold doesn't read. */
  final case class FunnelState(stage: Int, lastTs: Long,
                               pending: Seq[(Long, Long, String)])

  /** Streaming conversion funnel — the streaming twin of batch query
    * w6_funnel: per user, the view → click → purchase stage machine over
    * events ordered by (ts, event_id), the same total order as batch.
    *
    * The stage machine is ORDER-SENSITIVE and not incrementally
    * maintainable under out-of-order arrival (a late early view can
    * retroactively enable a click that already arrived), so an event
    * folds only once the watermark proves nothing earlier can still
    * come. Two consequences shape the design:
    *
    *  - **Bounded state for always-active users**: every batch, the
    *    prefix of the buffer with ts <= current watermark is order-FINAL
    *    (`withWatermark` has already dropped anything later-and-earlier)
    *    and folds into the carried stage immediately; only events above
    *    the watermark stay buffered. A bot emitting forever buffers at
    *    most its events inside the watermark horizon.
    *  - **Cumulative stage across quiet periods**: the fold result is
    *    CARRIED, not discarded, when the quiet-period timeout emits — a
    *    user who views, goes quiet (emit stage 1), then clicks and buys
    *    emits stage 3 next time, exactly the batch fold over all their
    *    events. Emissions are monotone; the latest per user equals batch
    *    once the watermark passes that user's last event. Per-user state
    *    after a timeout is one 3-field record (same bound and rationale
    *    as [[latestWinsStream]]: evicting a live user would forget their
    *    funnel position, which is data loss, not cleanup). */
  def funnelStages(events: Dataset[Event],
                   watermarkDelay: String = "30 minutes")
  : Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    def fold(st0: Int, evs: Seq[(Long, Long, String)]): Int =
      evs.sortBy(e => (e._1, e._2)).foldLeft(st0) { (st, e) =>
        (st, e._3) match {
          case (0, "view") => 1
          case (1, "click") => 2
          case (2, "purchase") => 3
          case _ => st
        }
      }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelStage](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            // wm > lastTs >= every pending ts: everything is final
            val s = state.get
            val stage = fold(s.stage, s.pending)
            state.update(FunnelState(stage, s.lastTs, Nil))
            Iterator.single(FunnelStage(uid, stage))
          } else {
            val prev = state.getOption.getOrElse(FunnelState(0, 0L, Nil))
            val buf = prev.pending ++
              it.map(e => (e.ts.getTime, e.event_id, e.event_type))
            // watermark-final prefix folds NOW (bounds the buffer);
            // later-and-earlier arrivals were already dropped upstream
            val (fin, pending) = buf.partition(_._1 <= wm)
            val next = FunnelState(fold(prev.stage, fin),
              math.max(prev.lastTs, buf.iterator.map(_._1).max), pending)
            state.update(next)
            // emit at the next quiet period: when the watermark clears
            // the newest event (strictly above the current watermark or
            // an already-passed deadline would never fire)
            state.setTimeoutTimestamp(
              math.max(next.lastTs + 1, wm + 1))
            Iterator.empty
          }
      }
  }

  /** Stream-static enrichment join: every micro-batch joins against the
    * BROADCAST static dimension — no streaming state, no watermark, and
    * the stream side never shuffles (the dim ships to executors once per
    * batch). The static plan re-resolves per trigger, so a slowly-
    * changing dimension picks up changes at the next batch without
    * restarting the query. This is how an ingest stream gets tagged with
    * catalog/config attributes at 100 TB/day: per-row work, zero state
    * growth. Left join: events with no dim row pass through with nulls
    * (R4 fault-tolerance discipline, not silent drops). */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   key: Seq[String]): DataFrame =
    stream.join(broadcast(dim), key, "left")

  /** Run the windowed aggregation over all currently-available files and
    * stop (batch-equivalent backfill; reference's incremental-resume
    * analog). Returns the result read back from the sink. */
  def backfillWindowed(spark: SparkSession, srcDir: String,
                       sinkDir: String, checkpointDir: String): DataFrame = {
    val q = windowedCounts(eventStream(spark, srcDir))
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sinkDir)
  }
}
