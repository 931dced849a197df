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

  /** PER-GROUP variant: `__cum` is the inclusive running sum of
    * `weightCol` in `(md5(key), key)` order WITHIN each `groupCol`
    * value — the machinery behind source-budgeted corpus mixing
    * ([[Mixture.mix]], query o10). Same execution shape as
    * [[mdOrderCumsum]] with the group prepended to the bucket key, so
    * a hot group still fans out over 16^hexChars window partitions
    * instead of one task. The driver folds groups × 16^hexChars
    * offsets into a literal map — bounded at 2^16 entries (mixture
    * groups are sources/domains, typically ≤ 10³; lower `hexChars`
    * for more groups, or pre-aggregate the group key). Zero-total
    * groups are fine here (an empty source simply selects nothing). */
  def mdOrderCumsumBy(df: DataFrame, groupCol: String, keyCol: String,
                      weightCol: String, hexChars: Int = 2): DataFrame = {
    val h = md5(col(keyCol).cast("string"))
    val g = col(groupCol).cast("string")
    val withB = df
      .withColumn("__h", h)
      .withColumn("__b", substring(h, 1, hexChars))
    val subtotals = withB
      .groupBy(g.as("__g"), col("__b"))
      .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(subtotals.length <= (1 << 16),
      s"${subtotals.length} (group, bucket) offsets exceed the literal-" +
        "map bound; lower hexChars or pre-aggregate the group key")
    val offMap = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var curGroup: String = null
    var acc = 0L
    subtotals.sortBy(t => (t._1, t._2)).foreach { case (g0, b0, s0) =>
      if (g0 != curGroup) { curGroup = g0; acc = 0L }
      offMap += ((s"$g0 $b0", acc))
      acc += s0
    }
    val offCol = element_at(
      map(offMap.toSeq.flatMap { case (k, o) => Seq(lit(k), lit(o)) }: _*),
      concat(g, lit(" "), col("__b")))
    val w = Window.partitionBy(g, col("__b"))
      .orderBy(col("__h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .withColumn("__cum",
        coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L))
          + offCol)
      .drop("__h", "__b")
  }
}
