package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.enrich.CaptionStats

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick raw-corpus documents whose HASHED-N-GRAM
  * distribution looks like a small trusted target corpus. The paper's
  * estimator is exactly bag-of-hashed-bigrams: every bigram maps into
  * one of B buckets, each corpus induces a bucket distribution, and a
  * document's importance weight is its sum of per-feature
  * log(p_target/p_raw) ratios. Dolma, Llama and the paper's own GLUE
  * runs use this as the cheap domain-targeting step before training.
  *
  * This engine keeps its no-libm discipline: the log-ratio is scored in
  * WHOLE BITS via bit lengths — λ_f = (bitlen(c_t(f)+1) − bitlen(N_t+B))
  * − (bitlen(c_r(f)+1) − bitlen(N_r+B)) — integer-exact on both
  * engines, monotone in the true log ratio and within 1 bit of it per
  * term (the t11/m17 code-length idiom); the +1/+B terms are add-one
  * smoothing, so an unseen-in-target bucket scores the maximal penalty
  * instead of −∞. Selection is deterministic top-k by the
  * LENGTH-NORMALIZED weight (mean bits per feature occurrence; the
  * unnormalized sum rewards length, not closeness — the paper's Gumbel
  * resampling is a diversity knob this deterministic form trades for
  * oracle-checkability, noted in §6.1 of the paper as "top-k" ablation).
  *
  * Scale shape (the reason DSIR is THE 100 TB selection method): the
  * target corpus is tiny and touched once; the raw corpus is touched in
  * ONE pass — map-side bigram hashing (no vocabulary, B fixed), one
  * (doc, distinct-bucket) map-combined shuffle for per-doc tf (≤ B
  * distinct keys per doc), bucket tables of ≤ B rows that BROADCAST
  * into the scoring join, and a TakeOrderedAndProject top-k. Nothing
  * scales with vocabulary; the λ table is a kilobyte artifact that can
  * persist and score incremental crawls with zero recompute (the
  * m16 LM-store discipline applies verbatim).
  *
  * Reference anchor: the repo this engine re-expresses filters by
  * hand-set thresholds (filters/filter_base.py); DSIR is the
  * learned-from-target generalization a 100 TB curation run needs. */
object Dsir {

  /** Hashed-bigram feature stream of `df`: one row per bigram
    * OCCURRENCE, feature id = md5-60-bit(prev ⊔ cur) mod `buckets`.
    * Bigrams build map-side from the token array (the m13 idiom — no
    * lag Window, no shuffle); docs with < 2 tokens contribute nothing
    * and are dropped from scoring (documented contract). */
  def features(df: DataFrame, idCol: String, textCol: String,
               buckets: Int): DataFrame = {
    // spread (r21): the md5-per-bigram map stage otherwise runs on a
    // single-partition small-file scan; the downstream aggregate keys
    // are doc-scoped, so repartitioning multiplies no partials
    val base = graft.util.Partitioning.spread(df)
      .filter(col(textCol).rlike("\\S"))
      .select(col(idCol),
        CaptionStats.tokens(lower(col(textCol))).as("__toks"))
      .filter(size(col("__toks")) >= 2)
    base.select(col(idCol), explode(expr(
        "transform(sequence(2, size(__toks)), i -> " +
          "concat(element_at(__toks, i - 1), ' ', element_at(__toks, i)))"))
        .as("__bg"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("__bg")), 1, 15), 16, 10)
          .cast("long"), lit(buckets.toLong)).as("f"))
  }

  /** The λ table: per raw-occurring bucket, the integer-bits importance
    * score. ≤ `buckets` rows — built from two map-combined bucket
    * counts, broadcastable, persistable (score tomorrow's crawl without
    * recounting the target). */
  /** λ table from the two bucket-count frames — THE scoring
    * definition, shared by the batch and incremental paths so the
    * smoothing can never de-synchronize between them. The join is FULL
    * OUTER: a bucket seen only in the TARGET corpus still gets its
    * (high) λ, so a persisted λ map scores tomorrow's crawl correctly
    * on exactly the most target-like features (a raw-side left join
    * would dump those buckets onto `lamDefault`, i.e. the c_t = 0
    * maximal penalty — the opposite of what they deserve). The batch
    * path is indifferent (its tf join is inner on raw buckets); only
    * [[scoreAgainst]] on unseen data observes the difference. */
  private def lamTable(rcnt: DataFrame, tcnt: DataFrame,
                       buckets: Int): DataFrame = {
    // coalesce: an EMPTY target (or raw) corpus must degrade to the
    // all-smoothing distribution, not propagate a null total through
    // every lambda (sum over zero rows is null in SQL semantics)
    val rN = rcnt.agg(coalesce(sum("c_r"), lit(0L)).as("n_r"))
    val tN = tcnt.agg(coalesce(sum("c_t"), lit(0L)).as("n_t"))
    val b = lit(buckets.toLong)
    rcnt.join(tcnt, Seq("f"), "full_outer")
      .crossJoin(broadcast(rN)).crossJoin(broadcast(tN))
      .select(col("f"),
        ((length(bin(coalesce(col("c_t"), lit(0L)) + 1L))
          - length(bin(col("n_t") + b)))
          - (length(bin(coalesce(col("c_r"), lit(0L)) + 1L))
            - length(bin(col("n_r") + b)))).cast("long").as("lam_bits"))
  }

  def bucketScores(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, buckets: Int): DataFrame = {
    val rf = features(raw, idCol, textCol, buckets)
    val tf = features(target, idCol, textCol, buckets)
    lamTable(rf.groupBy("f").agg(count(lit(1)).as("c_r")),
      tf.groupBy("f").agg(count(lit(1)).as("c_t")), buckets)
  }

  /** Per-document importance weights over the raw corpus:
    * (id, n_feats, weight_bits, mean_bits) — everything integer except
    * the final int/int mean.
    *
    * One raw-corpus pass AT RUNTIME, not just in the plan: the per-doc
    * tf frame (≤ B distinct keys per doc) is eagerly materialized
    * (localCheckpoint — the frame a production run persists anyway),
    * the raw bucket counts ROLL UP FROM IT (Σ_doc tf ≡ count of
    * occurrences), and the scoring join reads the SAME materialization
    * — so the features+shuffle chain over the raw corpus executes
    * exactly once even though two downstream plans consume it. The λ
    * rollup itself is a ≤ B-row aggregate of the checkpoint, broadcast
    * into the scoring join. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int): DataFrame = {
    val tf = features(raw, idCol, textCol, buckets)
      .groupBy(col(idCol), col("f")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val lam = lamTable(
      tf.groupBy("f").agg(sum("tf").as("c_r")), // Σ tf ≡ occurrences
      features(target, idCol, textCol, buckets)
        .groupBy("f").agg(count(lit(1)).as("c_t")), buckets)
    tf.join(broadcast(lam), Seq("f"))
      .groupBy(col(idCol))
      .agg(sum("tf").as("n_feats"),
        sum(col("tf") * col("lam_bits")).as("weight_bits"))
      .withColumn("mean_bits",
        col("weight_bits").cast("double") / col("n_feats").cast("double"))
  }

  /** MAP-ONLY scoring against a materialized λ table — the m16
    * incremental discipline for DSIR: the λ map (≤ B entries, the
    * bounded centroid-collect shape) folds into the plan as a literal,
    * so scoring a new crawl is a pure per-row expression — no join, no
    * aggregate, no shuffle — and composes onto a stream unchanged
    * (StreamsSpec pins streamed ≡ batch). `lamDefault` scores buckets
    * absent from λ — with the full-outer [[lamTable]] that genuinely
    * means absent from BOTH corpora at λ-build time, so the right value
    * is the pure-smoothing score bitlen(N_r+B) − bitlen(N_t+B). Docs
    * with < 2 tokens (or whitespace-only / null text) are DROPPED from
    * the output, matching the [[features]] contract and the batch path
    * — they are absent, not null-scored.
    *
    * The broadcast-join form ([[importanceWeights]]) stays the batch
    * path — a literal-map lookup is a linear scan per feature, the
    * right trade only where a shuffle-free single-row plan matters. */
  def scoreAgainst(df: DataFrame, idCol: String, textCol: String,
                   lam: Map[Long, Long], lamDefault: Long,
                   buckets: Int): DataFrame = {
    val lamLit = typedLit(lam)
    val toks = CaptionStats.tokens(lower(col(textCol)))
    val bgs = expr(
      "transform(sequence(2, size(__toks)), i -> " +
        "concat(element_at(__toks, i - 1), ' ', element_at(__toks, i)))")
    val fs = transform(col("__bgs"), bg =>
      pmod(conv(substring(md5(bg), 1, 15), 16, 10).cast("long"),
        lit(buckets.toLong)))
    df.filter(col(textCol).rlike("\\S"))
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) >= 2)
      .withColumn("__bgs", bgs)
      .select(col(idCol), size(col("__bgs")).cast("long").as("n_feats"),
        aggregate(fs, lit(0L), (acc, f) =>
          acc + coalesce(element_at(lamLit, f), lit(lamDefault)))
          .as("weight_bits"))
      .withColumn("mean_bits",
        col("weight_bits").cast("double") / col("n_feats").cast("double"))
  }

  /** End-to-end selection: split `df` on `srcCol` == `targetSrc`
    * (target) vs rest (raw), score the raw side, keep the top `k` docs
    * by (mean_bits desc, id) — a TakeOrderedAndProject, never a global
    * sort. Returns the selected docs with their scores, ordered by id.
    * The trailing source-label join re-reads only a column-pruned
    * (id, src) projection against the k-row selection — the one scan
    * past the weights pass, and a narrow one. */
  def select(df: DataFrame, idCol: String, textCol: String,
             srcCol: String, targetSrc: String, buckets: Int,
             k: Int): DataFrame = {
    val raw = df.filter(col(srcCol) =!= targetSrc)
    val target = df.filter(col(srcCol) === targetSrc)
    // scores materialize once (one row per raw doc — the frame a
    // production run persists anyway); top-k and the result join then
    // read the checkpoint instead of re-deriving the corpus pass twice
    val w = importanceWeights(raw, target, idCol, textCol, buckets)
      .localCheckpoint()
    val sel = w.orderBy(desc("mean_bits"), col(idCol)).limit(k)
      .select(col(idCol))
    w.join(sel, Seq(idCol))
      .join(df.select(col(idCol), col(srcCol)), Seq(idCol))
      .select(col(idCol), col(srcCol), col("n_feats"),
        col("weight_bits"), col("mean_bits"))
      .orderBy(col(idCol))
  }
}
