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
}
