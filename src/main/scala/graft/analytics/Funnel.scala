package graft.analytics

import org.apache.spark.sql.DataFrame
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
        val w = Window.partitionBy(col(userCol))
          .orderBy(col(tsCol), col(tieCol))
        ev.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= maxEventsPerUser).drop("__rn")
      }
    val branches = stageTypes.zipWithIndex.map { case (t, i) =>
      s"WHEN st = $i AND e.`$typeCol` = '$t' THEN ${i + 1}"
    }.mkString(" ")
    pruned.groupBy(col(userCol))
      // sort_array orders by struct fields left-to-right = (ts, tie, _)
      // — the same total order the rank prune uses
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieCol), col(typeCol)))).as("__evs"))
      .select(col(userCol),
        expr(s"aggregate(__evs, 0, (st, e) -> CASE $branches ELSE st END)")
          .as("stage"))
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
