package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch conversion-funnel stage machine — the w6 shape as a reusable
  * operator (streaming twin: [[graft.streaming.Streams.funnelStages]]).
  * Reference semantics: a user advances from stage i to i+1 on the first
  * event of `stageTypes(i)` seen AFTER reaching stage i, events ordered
  * by (ts, tie); no self-joins, no per-stage scans — ONE shuffle on the
  * user key and a per-user ordered fold whose state is a single int.
  *
  * Scale: per-user event lists bound the fold's memory. For organic
  * users that is fine; a BOT with millions of events makes one user's
  * list a task-killer. `maxEventsPerUser` is the SCALE.md-prescribed
  * mitigation: a rank-window prune keeps each user's first N events
  * (by the same (ts, tie) order the fold uses) BEFORE the collect. The
  * rank filter compiles to map-side `WindowGroupLimit` (the d11/x7
  * machinery, threshold raised by OptimizerTuning — keep N ≤ 4096 for
  * the map-side path), so a bot's events shrink to ≤ N per task before
  * they ever cross the shuffle. The prune is semantics-changing for a
  * user converting after event N, so it defaults OFF (0); with N ≥ the
  * longest genuine user it is an identity (spec-proven, FunnelSpec). */
object Funnel {

  /** Final stage per user: (userCol, stage), stage in 0..stageTypes.size.
    *
    * @param stageTypes event-type value per funnel step, in order
    * @param maxEventsPerUser > 0 caps each user to their first N events
    *                         (bot guard, default off — see scaladoc)
    */
  def stages(ev: DataFrame, userCol: String, tsCol: String, tieCol: String,
             stageTypes: Seq[String], typeCol: String = "event_type",
             maxEventsPerUser: Int = 0): DataFrame = {
    require(stageTypes.nonEmpty, "at least one funnel stage")
    val pruned =
      if (maxEventsPerUser <= 0) ev
      else {
        graft.util.OptimizerTuning.tune(ev.sparkSession)
        // the prune's order includes typeCol so it is the SAME total
        // order the fold sorts by — without it, duplicate (ts, tie)
        // pairs straddling the cap would keep a nondeterministic event
        val w = Window.partitionBy(col(userCol))
          .orderBy(col(tsCol), col(tieCol), col(typeCol))
        ev.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= maxEventsPerUser).drop("__rn")
      }
    // typed Column fold (not an expr() string): stage values are data,
    // never SQL text — a quote in a stage type cannot break parsing or
    // inject a predicate
    def step(st: Column, e: Column): Column =
      stageTypes.zipWithIndex.foldRight(st) { case ((t, i), acc) =>
        when(st === i && e.getField(typeCol) === t, lit(i + 1))
          .otherwise(acc)
      }
    pruned.groupBy(col(userCol))
      // sort_array orders by struct fields left-to-right = (ts, tie,
      // type) — the same total order the rank prune uses; pass a
      // (ts, tie) pair unique per user for a deterministic fold order
      // between different-type events at the same instant
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieCol), col(typeCol)))).as("__evs"))
      .select(col(userCol),
        aggregate(col("__evs"), lit(0), step).as("stage"))
  }

  /** Stage histogram: (stage, n_users) — the funnel report. */
  def report(ev: DataFrame, userCol: String, tsCol: String, tieCol: String,
             stageTypes: Seq[String], typeCol: String = "event_type",
             maxEventsPerUser: Int = 0): DataFrame =
    stages(ev, userCol, tsCol, tieCol, stageTypes, typeCol,
      maxEventsPerUser)
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
}
