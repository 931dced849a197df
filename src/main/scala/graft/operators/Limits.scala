package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group cardinality caps — the FineWeb/CCNet anti-spam move:
  * no single domain (or source, or author) may contribute more than
  * `cap` documents to the corpus, however many it crawled. */
object Limits {

  /** Keep at most `cap` rows per `keyCol`, chosen as the lowest
    * `orderCol` values (deterministic — re-runs keep the same rows;
    * ties are impossible when orderCol is a unique id, the intended
    * use).
    *
    * Scale shape: a rank Window partitioned by the key — and the
    * filter `rn <= cap` is the exact pattern Catalyst's
    * InferWindowGroupLimit rewrites into a map-side
    * [[org.apache.spark.sql.execution.window.WindowGroupLimitExec]]
    * (spec-pinned): every map partition prunes each key to its own
    * top-`cap` BEFORE the shuffle, so a spam domain with 10⁸ pages
    * ships at most cap × numPartitions rows to its reduce task, not
    * its full mass. The hot-key funnel a naive Window would create is
    * optimized away for free because the plan is declarative. */
  def capPerKey(df: DataFrame, keyCol: String, orderCol: String,
                cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
