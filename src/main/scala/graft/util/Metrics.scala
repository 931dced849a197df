package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall-loss observability for the engine's capped skew guards.
  *
  * The LSH pair stage, the incremental signature store, and SemDeDup
  * all DROP over-cap groups (a viral band bucket, an oversized
  * cluster) to keep one hot key from quadratic pair explosion — a
  * recall-only loss, never precision. At 100 TB a silently-vanishing
  * recall fraction is an operational hazard, so every capped site has
  * a REPORT: a one-row (dropped_groups, dropped_members) aggregate
  * over the same group-size frame the cap filter reads —
  * [[graft.dedup.Dedup.lshBucketCapReport]],
  * [[graft.dedup.Dedup.imageBucketCapReport]],
  * [[graft.dedup.Dedup.shardBucketCapReport]],
  * [[graft.similarity.Ann.semDedupClusterCapReport]]. The eager
  * builders compute the report themselves while their internal caches
  * are alive (one small aggregate job over cached data) and warn-log
  * nonzero drops; for the lazy builders run the matching report
  * standalone — it reuses whatever cache or bucketed store the
  * pipeline left behind.
  *
  * Why a second (cheap) job instead of an in-flight
  * `Dataset.observe`: a `CollectMetrics` node inside an AQE shuffle
  * stage never surfaces its metrics — `Observation` delivers an empty
  * row under `spark.sql.adaptive.enabled=true` unless the node sits
  * in the final result stage (verified empirically on Spark 4.1; the
  * cap filters here are mid-pipeline by construction). AQE is
  * non-negotiable at scale (skew-join splitting is the other half of
  * the same skew story), so the counters must not depend on its
  * absence. */
object Metrics {
  /** One-row report over a group-size frame: how many groups exceed
    * `cap`, and their combined membership. `coalesce` keeps the row
    * all-zeros (not null) when no group exists at all. */
  def capReport(sizes: DataFrame, sizeCol: String, cap: Long): DataFrame =
    sizes.agg(
      coalesce(sum(when(col(sizeCol) > cap, lit(1L)).otherwise(lit(0L))),
        lit(0L)).as("dropped_groups"),
      coalesce(sum(when(col(sizeCol) > cap, col(sizeCol).cast("long"))
        .otherwise(lit(0L))), lit(0L)).as("dropped_members"))

  /** The report's single row as (dropped_groups, dropped_members). */
  def drops(report: DataFrame): (Long, Long) = {
    val r = report.head()
    (r.getAs[Long]("dropped_groups"), r.getAs[Long]("dropped_members"))
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.metrics")

  /** Warn-log a capped site's recall loss (the eager builders call this
    * with their report while their caches are alive). */
  def logDrops(site: String, report: DataFrame): Unit = {
    val (g, m) = drops(report)
    if (g > 0L)
      log.warn(s"$site: dropped $g over-cap group(s) ($m members) — " +
        "recall loss; raise the cap or pre-split the hot keys")
  }
}
