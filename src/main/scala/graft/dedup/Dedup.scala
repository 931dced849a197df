package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.enrich.CaptionStats
import graft.text.TextAnalysis

/** Deduplication operators for LLM-scale corpora (north-star extension,
  * BASELINE.json). All keys are md5-derived so results are deterministic and
  * engine-independent (oracle-checkable), and every algorithm is expressed as
  * shuffle-on-key DataFrame plans that scale horizontally:
  *
  *  - exact:   hash-groupBy on a normalized fingerprint — one shuffle whose
  *             width is the number of *distinct* documents.
  *  - MinHash: per-doc signature is a map-side aggregation (explode tokens →
  *             groupBy doc), banding turns O(n²) similarity into equi-joins
  *             on band hashes — the classic LSH trick; the only shuffles are
  *             by doc_id then by band hash, never all-pairs.
  *  - SimHash: 16-bit majority signature, Hamming-bucket join.
  *  - n-gram Jaccard: verification on candidate pairs only.
  */
object Dedup {

  /** Exact-dup groups: fingerprint → canonical (min) id + member count.
    * Only groups with >1 member are duplicates. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.util.Partitioning.spread(df)
      .select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_members"))

  /** Exact dedup: keep one row (min id) per fingerprint. */
  def dropExactDups(df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val withFp = df.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
    val keep = withFp.groupBy("fp").agg(min(col(idCol)).as(idCol))
    withFp.join(keep, Seq("fp", idCol), "left_semi").drop("fp")
  }

  /** Distinct word n-gram shingles of a text column (n=1 → distinct
    * tokens). Shingling before MinHash is what makes LSH discriminative:
    * unigram Jaccard saturates on corpora with shared vocabulary, while
    * 3-gram shingles are near-unique to genuinely duplicated passages. */
  def shingles(c: Column, n: Int): Column =
    shinglesFromToks(CaptionStats.tokens(lower(c)), n)

  /** Shingles over an already-materialized token-array column. Keeping the
    * array in a named column (instead of inlining the tokenizer into the
    * lambda) matters: `slice(tokens(text), i, n)` re-runs the split per
    * shingle index — O(len²) per doc, measured 7× slower at sf0.1. */
  private def shinglesFromToks(toks: Column, n: Int): Column =
    if (n == 1) array_distinct(toks)
    else {
      val sh = transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", slice(toks, i + 1, lit(n))))
      array_distinct(when(size(toks) < n, array()).otherwise(sh))
    }

  /** MinHash signature columns: for each of k hash functions, the minimum
    * of md5(shingle || '#' || i) over the doc's distinct shingles.
    * Using md5-of-salted-shingle as the hash family keeps the signature
    * deterministic across engines; min-of-hash per doc is a map-side partial
    * aggregation (shuffle carries k hashes per doc, not shingles).
    *
    * Inputs narrower than the session's parallelism (e.g. one small parquet
    * file — parquet can't split below a row group) are repartitioned first:
    * the shingle+hash work dwarfs the tiny shuffle. Wide inputs (the 100 TB
    * case) keep their natural partitioning. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int, shingleN: Int = 1): DataFrame = {
    val withToks = graft.util.Partitioning.spread(df).select(col(idCol),
      CaptionStats.tokens(lower(col(textCol))).as("__toks"))
    val toks = withToks.select(col(idCol),
      explode(shinglesFromToks(col("__toks"), shingleN)).as("token"))
    val aggs = (0 until k).map(i =>
      min(md5(concat(col("token"), lit(s"#$i")))).as(s"mh$i"))
    toks.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a minhash signature: `bands` bands of `rowsPerBand`
    * hashes each; band key = md5(concat of the band's hashes). Docs sharing
    * any band key are candidate pairs. Returns (band_idx, band_key, id). */
  def lshBands(sig: DataFrame, idCol: String, bands: Int,
               rowsPerBand: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => col(s"mh$i"))
      struct(lit(b).as("band_idx"),
        md5(concat_ws("|", cols: _*)).as("band_key"))
    }
    sig.select(col(idCol), explode(array(bandRows: _*)).as("band"))
      .select(col("band.band_idx"), col("band.band_key"), col(idCol))
  }

  /** Candidate duplicate pairs (a < b) from shared LSH bands. The join is an
    * equi-join on (band_idx, band_key) — shuffle width scales with bucket
    * sizes, not n². */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 12, bands: Int = 4,
                            shingleN: Int = 3): DataFrame = {
    val rowsPerBand = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k, shingleN)
    // persist: the self-join below references the band table twice, and
    // without materialization Spark recomputes the whole shingle+minhash
    // pipeline per side (seen in the physical plan — two full
    // Generate→Aggregate chains). Size is (bands × docs) short rows.
    val b = lshBands(sig, idCol, bands, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = b.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_a"))
    val r = b.select(col("band_idx"), col("band_key"),
      col(idCol).as("id_b"))
    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** End-to-end near-duplicate detection: LSH candidates verified by
    * true shingle-Jaccard. Returns (id_a, id_b, jaccard) for verified
    * pairs (a < b, jaccard ≥ threshold).
    *
    * The shingle sets are computed ONCE per doc and joined to the
    * candidate pairs — verification work is O(candidates), never O(n²),
    * and the Jaccard formula is the exact-int-division form that
    * hash-matches a SQL oracle. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, k: Int = 12, bands: Int = 4,
                   shingleN: Int = 3): DataFrame = {
    val cand = minhashCandidatePairs(df, idCol, textCol, k, bands, shingleN)
    val sh = graft.util.Partitioning.spread(df)
      .select(col(idCol), col(textCol))
      .withColumn("__toks", CaptionStats.tokens(lower(col(textCol))))
      .select(col(idCol), shinglesFromToks(col("__toks"), shingleN).as("__s"))
    val a = sh.select(col(idCol).as("id_a"), col("__s").as("__sa"))
    val b = sh.select(col(idCol).as("id_b"), col("__s").as("__sb"))
    val inter = size(array_intersect(col("__sa"), col("__sb")))
    val uni = size(col("__sa")) + size(col("__sb")) - inter
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard",
        when(uni === 0, 0.0).otherwise(inter.cast("double") / uni))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-dedup: drop every doc verified near-duplicate of a lower-id
    * doc (greedy keep-first policy — the standard corpus-dedup rule;
    * full connected components would need an iterative join or graph
    * library). */
  def dropNearDups(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, k: Int = 12, bands: Int = 4,
                   shingleN: Int = 3): DataFrame = {
    val losers = nearDupPairs(df, idCol, textCol, threshold, k, bands,
      shingleN).select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Word n-gram Jaccard similarity between two text columns (distinct
    * shingles; n=1 → token Jaccard). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = shingles(a, n); val sb = shingles(b, n)
    val inter = size(array_intersect(sa, sb))
    // |A∪B| = |A|+|B|−|A∩B| over distinct shingles; exact int/int division
    // keeps the result bit-stable across engines (no rounding needed).
    val uni = size(sa) + size(sb) - inter
    when(uni === 0, 0.0).otherwise(inter.cast("double") / uni)
  }

  /** SimHash-16: bit i (0-based from the first hex nibble) is the majority
    * vote over tokens of the low bit of nibble i of md5(token). Returned as
    * a 16-char '0'/'1' string (engine-independent; no 64-bit bit ops needed
    * in the oracle). Near-dup candidates share the signature or differ in
    * few bits. */
  def simhash16(c: Column): Column = {
    val toks = array_distinct(CaptionStats.tokens(lower(c)))
    val bits = (0 until 16).map { i =>
      // +1 if nibble's low bit set ('1','3','5','7','9','b','d','f'), else -1
      val vote = aggregate(toks, lit(0), (acc, t) =>
        acc + when(instr(lit("13579bdf"),
          substring(md5(t), i + 1, 1)) > 0, 1).otherwise(-1))
      when(vote > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
