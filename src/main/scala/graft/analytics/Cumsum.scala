package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global cumulative sum over the engine's md5 permutation —
  * the shared machinery behind weighted sampling
  * ([[Summary.weightedSample]], query o8) and sequence packing (query
  * p9). The semantics are ONE global running sum in
  * `(md5(key), key)` order; the execution never runs a global
  * single-reducer sort:
  *
  *  - bucket rows on the first `hexChars` of md5(key) — deterministic
  *    FROM THE DATA (no recompute-sensitive `spark_partition_id`, so
  *    nothing needs persisting), uniform by md5's construction, and
  *    lexicographically ALIGNED with the global order (the bucket is a
  *    prefix of the sort key);
  *  - one map-side-combined groupBy collects the 16^hexChars bucket
  *    subtotals to the driver (kilobytes), which folds them into literal
  *    per-bucket offsets;
  *  - the cumulative window then runs per bucket (16^hexChars-way
  *    parallel; `hexChars` scales the fan-out) and adds the offset.
  *
  * Weights must be non-negative longs after cast. */
object Cumsum {

  /** Returns (df + `__cum` column, total): `__cum` is the inclusive
    * global running sum of `weightCol` in `(md5(key), key)` order.
    * Requires a positive total. NULL weights count as 0 (the same
    * null-skipping a SQL window SUM applies) — a bucket whose weights
    * are all NULL must yield offset 0, not a driver-side NPE on the
    * collected subtotal. */
  def mdOrderCumsum(df: DataFrame, keyCol: String, weightCol: String,
                    hexChars: Int = 2): (DataFrame, Long) = {
    val h = md5(col(keyCol).cast("string"))
    val withB = df
      .withColumn("__h", h)
      .withColumn("__b", substring(h, 1, hexChars))
    val subtotals = withB.groupBy("__b")
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val total = subtotals.map(_._2).sum
    require(total > 0, "total weight must be positive")
    var acc = 0L
    val offMap = subtotals.map { case (b, s) =>
      val o = acc; acc += s; (b, o)
    }
    val offCol = element_at(
      map(offMap.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*),
      col("__b"))
    val w = Window.partitionBy("__b").orderBy(col("__h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = withB
      .withColumn("__cum",
        coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L))
          + offCol)
      .drop("__h", "__b")
    (out, total)
  }
}
