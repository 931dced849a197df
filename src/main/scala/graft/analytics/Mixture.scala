package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-weighted corpus mixing to a token budget — the data-mixture
  * step of LLM pretraining (the Pile / LLaMA-style recipe: "X% web,
  * Y% code, Z% papers"): given per-source target weights and a total
  * budget, select documents per source until that source's share of
  * the budget fills.
  *
  * Selection is DETERMINISTIC, not random: within each source,
  * documents are taken in `(md5(id), id)` order — the engine's seeded
  * permutation (the o5/o8 discipline: data-derived, stable under
  * re-runs, retries, and cluster resizing; no RNG state) — and a
  * document is kept iff it STARTS before the source's budget ends
  * (`cum − w < budget`, so the budget-crossing document is included:
  * greedy take-until-exceeded, never an under-filled final gap). Two
  * corpora mixed with the same weights are reproducible token-for-token.
  *
  * Scale shape: one filter + [[Cumsum.mdOrderCumsumBy]] — a per-source
  * md5-bucketed cumulative sum (16^hexChars-way parallel within every
  * source: a 90%-weight web crawl fans out over buckets, never one
  * window task) + a literal per-source budget lookup. No global sort,
  * no shuffle beyond the cumsum's bucket window. */
object Mixture {

  /** Select a `targets`-weighted mixture of `docs` totalling ~`budget`
    * units of `weightCol` (tokens, chars, bytes — caller's choice).
    * `targets` maps source value → target fraction (need not sum to 1;
    * each source's budget is `floor(fraction × budget)` independently).
    * Sources absent from `targets` are dropped; a source with fewer
    * units than its budget contributes everything it has. Weights must
    * be non-negative; returns the input columns plus nothing. */
  def mix(docs: DataFrame, idCol: String, sourceCol: String,
          weightCol: String, targets: Seq[(String, Double)],
          budget: Long, hexChars: Int = 2): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.forall(_._2 >= 0), "target weights must be >= 0")
    val budgets = targets.map { case (s, f) =>
      s -> math.floor(f * budget).toLong
    }
    val tgt = docs.filter(
      col(sourceCol).cast("string").isin(targets.map(_._1): _*))
    val cum = Cumsum.mdOrderCumsumBy(tgt, sourceCol, idCol, weightCol,
      hexChars)
    val budgetCol = element_at(
      map(budgets.flatMap { case (s, b) => Seq(lit(s), lit(b)) }: _*),
      col(sourceCol).cast("string"))
    cum.filter(col("__cum") - col(weightCol).cast("long") < budgetCol)
      .drop("__cum")
  }

  /** [[mix]] with UPSAMPLING: real mixture recipes repeat high-quality
    * sources beyond one epoch (LLaMA-style "Wikipedia ×2.4"), which
    * [[mix]]'s take-until-budget cannot express — a source whose budget
    * exceeds its size just contributes everything once. Here every doc
    * of a targeted source gets `n_repeats = ⌊b_s/T_s⌋` full epochs
    * (b_s = its source's budget, T_s = its source's total weight) plus
    * 1 iff it starts before the remainder `b_s mod T_s` on the
    * per-source md5 permutation line — the same greedy
    * take-until-exceeded rule as [[mix]], applied to the partial final
    * epoch. Docs with zero repeats drop. Downstream materializes
    * repeats however it likes (explode(sequence) for physical copies,
    * or a weight column for loss scaling) — emitting the count keeps
    * this operator map-shaped instead of data-multiplying.
    *
    * Deterministic end to end; per-source totals are one map-combined
    * aggregate collected to the driver (sources are bounded — the o10
    * group-cardinality contract). */
  def mixWithEpochs(docs: DataFrame, idCol: String, sourceCol: String,
                    weightCol: String, targets: Seq[(String, Double)],
                    budget: Long, hexChars: Int = 2): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.forall(_._2 >= 0), "target weights must be >= 0")
    val budgets = targets.map { case (s, f) =>
      s -> math.floor(f * budget).toLong
    }
    val tgt = docs.filter(
      col(sourceCol).cast("string").isin(targets.map(_._1): _*))
    val totals = tgt
      .groupBy(col(sourceCol).cast("string").as("__s"))
      .agg(sum(col(weightCol).cast("long")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val epochs = budgets.map { case (s, b) =>
      val t = totals.getOrElse(s, 0L)
      s -> (if (t > 0) b / t else 0L)
    }
    val rems = budgets.map { case (s, b) =>
      val t = totals.getOrElse(s, 0L)
      s -> (if (t > 0) b % t else 0L)
    }
    def lut(m: Seq[(String, Long)]) = element_at(
      map(m.flatMap { case (s, v) => Seq(lit(s), lit(v)) }: _*),
      col(sourceCol).cast("string"))
    val cum = Cumsum.mdOrderCumsumBy(tgt, sourceCol, idCol, weightCol,
      hexChars)
    cum.withColumn("n_repeats", lut(epochs) +
        when(col("__cum") - col(weightCol).cast("long") < lut(rems), 1L)
          .otherwise(0L))
      .filter(col("n_repeats") > 0L)
      .drop("__cum")
  }

  /** Deterministic PROPORTIONAL INTERLEAVE — the epoch-ORDER step after
    * [[mix]] selects: a trainer streaming the corpus front-to-back
    * should see sources blended at their target ratios everywhere, not
    * source-sized blocks (a source block is a distribution-shift ramp
    * mid-epoch). Each doc gets `ikey = (rn−1) · (L / w_s)` where rn is
    * its rank on the source's md5 permutation line and L = lcm(weights):
    * reading in `ikey` order emits sources at evenly spaced positions
    * ∝ weight (weight 5 fires every L/5 ticks, weight 2 every L/2 —
    * the classic smooth weighted round-robin / stride-scheduling rule,
    * exact in integers). Ties (ikey 0 is shared by every source's
    * first doc) break by source then id — total order, engine-portable.
    *
    * Output: input columns + `rn` + `ikey`; consume with
    * `ORDER BY ikey, source, id`. Scale shape: the per-source rank is
    * one Window per source (fine for thousands of sources — the t17
    * note); the total order is realized by a range-partitioned sort on
    * the key columns, never a single-task global Window — a dense
    * global position would cost exactly that, so the operator
    * deliberately emits the sparse key instead. `L · max(rn)` must fit
    * a long: fine through 10¹² docs per source × lcm ≤ 10⁶. */
  def interleave(docs: DataFrame, idCol: String, sourceCol: String,
                 weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 > 0), "interleave weights must be > 0")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = weights.map(_._2).reduce((a, b) => a / gcd(a, b) * b)
    val strides = weights.map { case (s, w) => (s, l / w) }
    val lut = element_at(
      map(strides.flatMap { case (s, v) => Seq(lit(s), lit(v)) }: _*),
      col(sourceCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.filter(col(sourceCol).isin(weights.map(_._1): _*))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("ikey", (col("rn") - 1L) * lut)
  }
}
