package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1000L, "t", "the cat sat on the mat"),
    (1001L, "t", "the cat slept on the mat"),
    (1002L, "t", "a cat sat on a mat")).toDF("doc_id", "source", "text")

  // raw: two docs sharing the target's bigrams, two of alien vocabulary
  private val raw = Seq(
    (1L, "r", "the cat sat on the mat again"),
    (2L, "r", "a cat slept on the mat"),
    (3L, "r", "zq xw vv kj pq mn zz"),
    (4L, "r", "qqq www eee rrr ttt yyy")).toDF("doc_id", "source", "text")

  test("importance weights rank target-like docs above alien-vocabulary " +
    "docs (the paper's core claim, in bits)") {
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text",
      buckets = 64).collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_bits")).toMap
    // every target-like doc outscores every alien doc
    for (good <- Seq(1L, 2L); bad <- Seq(3L, 4L))
      w(good) should be > w(bad)
  }

  test("bucket-score table is bounded by B and smoothing keeps unseen-" +
    "in-target buckets finite (maximal penalty, not -inf)") {
      val lam = Dsir.bucketScores(raw, target, "doc_id", "text",
        buckets = 64).collect()
      lam.length should be <= 64
      // alien buckets (c_t = 0) exist in this fixture and score the
      // minimum; all scores are small integers, never sentinel values
      val bits = lam.map(_.getLong(1))
      bits.min should be < 0L
      all(bits) should (be >= -64L and be <= 64L)
  }

  test("docs with < 2 tokens are excluded from scoring; selection is " +
    "the deterministic top-k by (mean_bits desc, id)") {
    val withShort = raw.union(Seq((5L, "r", "single"), (6L, "r", ""))
      .toDF("doc_id", "source", "text"))
    val all6 = withShort.union(target)
    val sel = Dsir.select(all6, "doc_id", "text", "source",
      targetSrc = "t", buckets = 64, k = 2).collect()
    sel.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L) // target-like pair
    // short/empty docs neither scored nor selected
    Dsir.importanceWeights(withShort, target, "doc_id", "text", 64)
      .filter(col("doc_id") >= 5L).count() shouldBe 0L
  }

  test("empty target corpus degrades to the all-smoothing distribution " +
    "instead of nulling every weight") {
    val noTarget = target.filter(col("doc_id") < 0L)
    val w = Dsir.importanceWeights(raw, noTarget, "doc_id", "text", 64)
      .collect()
    w.length shouldBe 4
    // every lambda is bitlen(1) − bitlen(0+64) − (bitlen(c_r+1) −
    // bitlen(n_r+64)) — finite integers, no nulls anywhere
    w.foreach { r =>
      r.isNullAt(2) shouldBe false
      r.getAs[Double]("mean_bits").isNaN shouldBe false
    }
  }

  test("map-only scoreAgainst equals the broadcast-join batch weights " +
    "on every doc (the m16-style incremental/streaming shape)") {
    val lam = Dsir.bucketScores(raw, target, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamed = Dsir.scoreAgainst(raw, "doc_id", "text", lam,
        lamDefault = 0L, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Dsir.importanceWeights(raw, target, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    streamed shouldBe batch
    // and the plan is join-free, aggregate-free, exchange-free
    val plan = Dsir.scoreAgainst(raw, "doc_id", "text", lam, 0L, 64)
      .queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Exchange"
  }

  test("λ covers TARGET-only buckets (full-outer build): a bigram seen " +
    "only in the target corpus scores its high λ in scoreAgainst, not " +
    "the lamDefault penalty — the persisted-λ new-crawl contract") {
    // "slept mat" appears nowhere; craft a target with a unique bigram
    val t2 = Seq((1000L, "t", "uniqua uniqub uniqua uniqub")) // bigrams of rare tokens
      .toDF("doc_id", "source", "text")
    val lam = Dsir.bucketScores(raw, t2, "doc_id", "text", buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the target-only bucket for "uniqua uniqub" must be IN λ...
    val f = Dsir.features(t2, "doc_id", "text", 4096)
      .select("f").distinct().collect().map(_.getLong(0))
    f.foreach { b => lam.keySet should contain(b) }
    // ...and score ABOVE the pure-smoothing default (c_t > 0 ⇒ better
    // than absent-from-both), so a new crawl doc hitting it is rewarded
    val nR = 22L; val nT = 3L; val b = 4096L // raw/target occurrence totals
    val lamDefault = (java.lang.Long.toBinaryString(nR + b).length
      - java.lang.Long.toBinaryString(nT + b).length).toLong
    f.foreach { bk => lam(bk) should be >= lamDefault }
    // and a streamed doc made of the target-only bigram outranks an
    // alien-vocabulary doc under the SAME frozen λ
    val crawl = Seq((50L, "uniqua uniqub uniqua"), (51L, "zz9 yy8 xx7"))
      .toDF("doc_id", "text")
    val scored = Dsir.scoreAgainst(crawl, "doc_id", "text", lam,
        lamDefault, 4096)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_bits")).toMap
    scored(50L) should be > scored(51L)
  }

  test("scale shape: λ joins broadcast, selection is TakeOrdered — " +
    "never a global sort or a shuffled join of the corpus") {
    val plan = Dsir.select(raw.union(target), "doc_id", "text", "source",
      targetSrc = "t", buckets = 64, k = 2)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should include("BroadcastHashJoin")
  }
}
