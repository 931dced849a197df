package graft.filters

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven numeric range filters (SURVEY.md §2.4).
  *
  * The reference builds per-column predicates `(x > min) & (x < max)` with
  * EXCLUSIVE bounds and defaults `min = -1`, `max = sys.maxsize`
  * (reference `filters/filter_base.py:14-19`, `filters/__init__.py:6-24`),
  * then applies them sequentially with a NaN-mask + dropna dance
  * (`wikicaps_etl_pipeline.py:157-170`). In Spark the chain is a plain
  * conjunction of `Column` predicates — Catalyst fuses them into one filter
  * and pushes them into the Parquet scan, so at 100 TB the predicate runs
  * inside the scan (row-group pruning + vectorized filter), not as a
  * post-pass.
  */
object RangeFilters {

  /** One exclusive-bound range predicate; None = reference default
    * (min = -1, max = Long.MaxValue as in `filters/__init__.py:11-17`). */
  final case class RangeFilter(column: String,
                               min: Option[Double] = None,
                               max: Option[Double] = None) {
    def predicate: Column =
      col(column) > lit(min.getOrElse(-1.0)) &&
        col(column) < lit(max.getOrElse(Long.MaxValue.toDouble))
  }

  /** F5 schema assertion (`wikicaps_etl_pipeline.py:162-163`): fail fast at
    * plan-build time when a configured filter names a missing column. */
  def validate(df: DataFrame, filters: Seq[RangeFilter]): Unit = {
    val have = df.columns.toSet
    val missing = filters.map(_.column).filterNot(have)
    require(missing.isEmpty,
      s"filter column(s) not in schema: ${missing.mkString(", ")}")
  }

  /** F1/F2: conjunctive application. One Catalyst Filter node; no NaN dance
    * needed (Spark nullability subsumes the pandas float/NaN repair, P7). */
  def apply(df: DataFrame, filters: Seq[RangeFilter]): DataFrame = {
    validate(df, filters)
    filters.foldLeft(df)((d, f) => d.filter(f.predicate))
  }
}
