package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark's DataFrame API lacks as first-class operators,
  * built scale-first.
  *
  * The classic as-of implementations are (a) a correlated lookup per left
  * row or (b) an inequality join + per-left-row top-1 — both quadratic in
  * matches per key and, in Spark, (b) plans as a sort-merge join whose
  * range residual runs on every (left, right) key pair. The union+window
  * form below replaces that pair explosion with LINEAR work: tag both
  * inputs, sort ONCE per key on (ts, side, tie), and carry the most
  * recent right payload forward with `last(ignoreNulls)` over a running
  * rows frame. One shuffle (the window's), zero joins, linear in
  * |left| + |right|, and skew lands in Spark's sort machinery (spillable,
  * so it completes). A truly hot key still serializes in ONE window task
  * though — window partitions never AQE-split — so when one key can
  * carry an unbounded share of the data, use [[asofJoinBucketed]], which
  * adds time granularity to the partition key and splits the hot key
  * across its timeline. */
object Joins {

  /** As-of join: for each left row, the right row with the greatest
    * `tsCol <= left.tsCol` on the same `key` (ties on ts broken by the
    * greatest `tieCol`, resolved against the RIGHT side only — pass a
    * right-unique id for determinism; left rows don't need it, the tie
    * never disambiguates them). Left rows with no prior right row keep
    * null matches (left-outer semantics).
    *
    * Output: every `left` column, plus each `rightCols` column as
    * `<prefix><name>` from the matched right row.
    *
    * `left` and `right` may share column names (e.g. two slices of the
    * same events table) — the right side is folded into a single struct
    * before the union so nothing collides.
    *
    * Right rows with a NULL `tsCol` are dropped: SQL as-of semantics
    * (an inequality `right.ts <= left.ts`) never match a null ts, but
    * ascending-nulls-first window ordering would sort such a row before
    * every left row and make it the fallback match for left rows that
    * should have none. Left rows with a null ts keep null matches (they
    * sort before every non-null right row, so no prior match exists). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, tieCol: String, rightCols: Seq[String],
               prefix: String = "r_"): DataFrame = {
    val r = right.filter(col(tsCol).isNotNull)
      .select(col(key), col(tsCol).as("__ts"),
      col(tieCol).as("__tie"), lit(0).as("__side"),
      struct(rightCols.map(col): _*).as("__rv"))
    val l = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__tie", lit(null).cast(r.schema("__tie").dataType))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
    // right rows sort before left rows at equal ts (side 0 < 1), so a
    // right row AT the left row's instant matches — standard asof <=
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(prefix + c)): _*)
  }

  /** As-of join with a TIME-BUCKET PRE-SPLIT — the monster-key treatment
    * SCALE.md prescribes for the whole per-key-sort family (as-of j4,
    * latest-wins d11, native as-of j11): [[asofJoin]]'s single window
    * sorts every row of a key in one task, which is linear and spillable
    * but still ONE task when a key holds a measurable fraction of 100 TB.
    * Here the window partitions on (key, floor(ts / bucket)) instead, so
    * a hot key splits across its timeline, and matches crossing a bucket
    * boundary are restored by a carry: per (key, bucket) the last right
    * payload is a map-combined `max_by` aggregate, and a SECOND window —
    * over bucket summaries, whose partition size is the number of
    * buckets, bounded by time-span / bucket and independent of row count
    * — carries the most recent payload into each bucket. A left row's
    * match is its within-bucket running match, else its bucket's
    * carry-in; equality with [[asofJoin]] is spec-proven on generated
    * data including a monster key (JoinsSpec).
    *
    * Cost: vs asofJoin, one extra map-combined aggregate, one tiny
    * window, and one (key, bucket) equi-join — all AQE-splittable
    * shapes. The tagged union is consumed by two branches (row window;
    * bucket summary — the spine folds into the summary aggregate since
    * max_by skips null orderings) whose per-branch column pruning
    * defeats exchange reuse, so the INPUTS are read up to 2× — persist
    * them (or feed pre-materialized tables) when scans dominate; the
    * operator's
    * job is splitting the hot key, which no persistence solves. Use
    * when keys can be huge; `bucket` should be coarse enough
    * that bucket counts stay small (e.g. a day of epoch-µs for
    * year-span data). `tsCol` must be numeric (epoch-µs LONG) here —
    * bucketing needs exact integer arithmetic (same pmod discipline as
    * [[rangeJoin]]). INT64 ENDPOINT: timestamps in the bottom partial
    * bucket — within `bucketMicros` of `Long.MinValue` — underflow the
    * label (`ts − pmod(ts, w)` wraps), which mis-orders the carry
    * window and, for `bucketMicros ≥ 2`, can collide that bucket's
    * label with a top-range bucket's. Epoch-µs data spans ±292k years,
    * so real timestamps never get there; guard the input if your
    * ts domain is synthetic. Same null semantics as [[asofJoin]]:
    * null-ts right rows never match, null-ts left rows match
    * nothing. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                       tsCol: String, tieCol: String,
                       rightCols: Seq[String], bucketMicros: Long,
                       prefix: String = "r_"): DataFrame = {
    require(bucketMicros > 0, "bucket must be positive")
    val w = lit(bucketMicros)
    // the bucket LABEL is the bucket's start timestamp, ts − pmod(ts, w):
    // pure long arithmetic, exact everywhere except the bottom partial
    // bucket at Long.MinValue (see scaladoc). A quotient form over
    // Column `/` would be IEEE double division (exact only for
    // |ts| < 2^53 — a mis-bucketed extreme timestamp silently changes
    // matches); the label only needs to be injective per bucket and
    // ordered with ts, which the start timestamp is.
    def bucket(ts: Column): Column = ts - pmod(ts, w)
    val r = right.filter(col(tsCol).isNotNull)
      .select(col(key), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), lit(0).as("__side"),
        struct(rightCols.map(col): _*).as("__rv"))
    val l = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__tie", lit(null).cast(r.schema("__tie").dataType))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__b", bucket(col("__ts")))
    // 1. within-bucket running match — the [[asofJoin]] window, but
    // partitioned on (key, bucket) so a hot key splits across time
    val wIn = Window.partitionBy(col(key), col("__b"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withIn = u.withColumn("__m_in",
      last(col("__rv"), ignoreNulls = true).over(wIn))
    // 2. bucket summaries: ONE map-combined aggregate serves as both the
    // spine (a group exists for every (key, bucket) present on EITHER
    // side — left-only buckets still need a carry) and the last-right-
    // payload extractor (max_by SKIPS null orderings, so left rows
    // contribute the group but never the payload; (ts, tie) is
    // right-unique, so the winner is deterministic). The hot bucket
    // collapses before the shuffle.
    val bucketLast = u.filter(col("__b").isNotNull)
      .groupBy(col(key), col("__b"))
      .agg(max_by(col("__rv"), when(col("__side") === 0,
        struct(col("__ts"), col("__tie")))).as("__bl"))
    // 3. carry-in per bucket: the window partition holds one row per
    // bucket — its size is bounded by time-span / bucket, not row count
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = bucketLast
      .withColumn("__carry", last(col("__bl"), ignoreNulls = true)
        .over(wCarry))
      .select(col(key), col("__b"), col("__carry"))
    withIn.join(carries, Seq(key, "__b"), "left")
      .filter(col("__side") === 1)
      .withColumn("__m", coalesce(col("__m_in"), col("__carry")))
      .select(left.columns.map(col) ++
        rightCols.map(c => col("__m").getField(c).as(prefix + c)): _*)
  }

  /** Interval (range) join: every (left, right) pair on the same `key`
    * with `right.ts in [left.ts - lookback, left.ts]` (both ends
    * inclusive). The naive formulation — an equi-join on key with a
    * range residual — plans as a sort-merge join that re-scans every
    * right row per left row within a key, O(|L_k| × |R_k|) on a hot key.
    * This form buckets time into `lookback`-sized cells: a right row at
    * ts can only match left rows in cell floor(ts/W) or floor(ts/W)+1,
    * so the right side is duplicated exactly 2× into those cells and the
    * join becomes a plain equi-join on (key, cell) + exact range filter.
    * The shuffle key gains time granularity, which also SPLITS a hot key
    * across its timeline instead of concentrating it in one task — the
    * classic band-join decomposition (cf. epsilon-grid / bucket range
    * joins in the literature). Each pair is produced exactly once (the
    * left row's single cell meets one of the two right copies).
    *
    * `tsCol` must be numeric (e.g. epoch-µs LONG) on both inputs.
    * Output: every left column plus each `rightCols` column as
    * `<prefix><name>`; inner semantics (unmatched left rows drop). */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                tsCol: String, lookbackMicros: Long,
                rightCols: Seq[String],
                prefix: String = "r_"): DataFrame = {
    require(lookbackMicros > 0, "lookback must be positive")
    val w = lit(lookbackMicros)
    // cell LABEL = the cell's start timestamp, ts − pmod(ts, W): pure
    // long arithmetic. Any division — even of an exact multiple — would
    // route through IEEE doubles (Column `/`), which breaks above 2^53;
    // a cell flipped on ONE side breaks the adjacent-cell guarantee and
    // silently drops pairs. The successor cell's label is start + W.
    // INT64 ENDPOINTS: within W of Long.MinValue the label underflows
    // and near Long.MaxValue the successor label overflows — both wrap
    // CONSISTENTLY (every ts in a cell wraps to the same long, both
    // sides computing it identically), so equi-join matching still
    // pairs the right cells; a wrapped-label COLLISION between two
    // far-apart cells only adds candidate rows that the exact range
    // residual below then rejects. Unlike the bucketed as-of join, no
    // ordering is taken over labels here, so results stay exact over
    // the full int64 range.
    def cell(ts: Column): Column = ts - pmod(ts, w)
    val r = right.select(col(key).as("__rk"), col(tsCol).as("__rts"),
        struct(rightCols.map(col): _*).as("__rv"))
      .withColumn("__cell",
        explode(array(cell(col("__rts")), cell(col("__rts")) + w)))
    left
      .withColumn("__lcell", cell(col(tsCol)))
      .join(r, col(key) === col("__rk") &&
        col("__lcell") === col("__cell") &&
        col("__rts") >= col(tsCol) - w && col("__rts") <= col(tsCol))
      .select(left.columns.map(col) ++
        rightCols.map(c => col("__rv").getField(c).as(prefix + c)): _*)
  }

  /** Range join on a trailing time window, expressed as a window
    * aggregate instead of a join: counts right-predicate rows with
    * `ts in [left.ts - lookback, left.ts]` on the same key. The
    * inequality-join formulation re-scans every in-range right row per
    * left row; the RANGE frame computes all of them in one pass over a
    * single per-key sort (Spark's WindowExec slides the frame bounds
    * monotonically). `tsMicros` must be a LONG epoch-µs column. */
  def trailingCount(df: DataFrame, key: String, tsMicros: String,
                    countIf: org.apache.spark.sql.Column,
                    lookbackMicros: Long, as: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsMicros))
      .rangeBetween(-lookbackMicros, 0)
    df.withColumn(as, count(when(countIf, lit(1))).over(w))
  }
}
