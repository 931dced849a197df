package graft.util

import org.apache.spark.sql.SparkSession

/** Session-level optimizer tunings the engine depends on.
  *
  * `InferFiltersFromGenerate` adds `size(arr) > 0` under every explode,
  * CLONING the generator's child expression into the new filter. Filter
  * pushdown then substitutes aliases on the way down, so an array built by
  * a higher-order function over an aliased token column (the shingle
  * shape: `transform(sequence(...), i -> concat_ws(slice(__toks, ...)))`)
  * gets the tokenizer re-inlined INSIDE lambda scope — and HOF lambdas
  * re-evaluate inlined subtrees PER ELEMENT. Measured on the d8 corpus
  * shingle explode at sf0.1: 8.6 s with the rule, 0.5 s without — a 17×
  * tax for an optimization that only pre-skips rows a non-outer Generate
  * drops anyway (it exists to enable scan pushdown of emptiness checks,
  * which never helps a computed array). Excluding the rule is semantics-
  * preserving: inferred filters only remove rows that produce zero
  * generator output. */
object OptimizerTuning {

  val InferFiltersFromGenerate =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  /** Append a rule to `spark.sql.optimizer.excludedRules`, preserving any
    * exclusions already configured. Idempotent; safe to call per query. */
  def excludeRule(spark: SparkSession, rule: String): Unit = {
    val key = "spark.sql.optimizer.excludedRules"
    val cur = spark.conf.getOption(key).filter(_.nonEmpty)
    if (!cur.exists(_.split(",").map(_.trim).contains(rule)))
      spark.conf.set(key, cur.map(_ + "," + rule).getOrElse(rule))
  }

  /** The engine's standing session tunings — called by every query builder
    * ([[graft.Queries]]) and the explode-heavy dedup entry points, so any
    * host session (driver, tests, user code) gets the fix.
    *
    * These MUTATE the host session's runtime conf and deliberately do NOT
    * restore it: the optimizer reads SQLConf when an ACTION runs, not when
    * the DataFrame is built, so a save/restore around a lazy builder would
    * silently undo the tuning before it ever applies. Both settings are
    * monotone performance knobs, never semantics changes:
    *
    *  - `excludedRules` += [[InferFiltersFromGenerate]] (the 17× HOF
    *    re-evaluation tax documented above);
    *  - `windowGroupLimitThreshold` raised 1000 → 4096 so rank-filter
    *    pre-prunes up to that bound (e.g. x7's `row_number() <= 2000`)
    *    compile to map-side `WindowGroupLimit` instead of shipping every
    *    row of a skewed partition key to one reducer. Raising the
    *    threshold only widens when that prune FIRES; plans below the
    *    default are untouched. */
  def tune(spark: SparkSession): Unit = {
    excludeRule(spark, InferFiltersFromGenerate)
    val wgl = "spark.sql.optimizer.windowGroupLimitThreshold"
    if (spark.conf.getOption(wgl).forall(_.toInt < 4096))
      spark.conf.set(wgl, "4096")
  }
}
