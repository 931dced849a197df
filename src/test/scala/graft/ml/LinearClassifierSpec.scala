package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearClassifierSpec extends SparkSpec {
  import spark.implicits._

  // md5("a") = 0cc1... → bucket '0' (dim index 0); md5("b") = 92eb... →
  // bucket '9' (dim index 9); bias at index 16.
  test("batch perceptron: hand-computed round trace — round 1 updates " +
    "on all docs (w=0 scores 0), converged rounds change nothing") {
    val d = Seq((1L, "a", 1L), (2L, "b", -1L)).toDF("doc_id", "text", "y")
    val w = LinearClassifier.trainPerceptron(d, "text", "y", rounds = 3)
    val expected = Array.fill(17)(0L)
    expected(0) = 1L   // +1 · x("a")
    expected(9) = -1L  // −1 · x("b")
    // bias: +1·1 + (−1)·1 = 0
    w shouldBe expected.toSeq
    val scored = LinearClassifier.score(d, "doc_id", "text", w)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    scored shouldBe Array((1L, 1L, 1L), (2L, -1L, -1L))
  }

  test("a linearly separable fixture converges: every doc classified " +
    "correctly after training; feature cache is released") {
    val pos = (1 to 8).map(i => (i.toLong, s"alpha alpha beta x$i", 1L))
    val neg = (9 to 16).map(i => (i.toLong, s"gamma delta delta x$i", -1L))
    val d = (pos ++ neg).toDF("doc_id", "text", "y")
    // cache-release is relative: other suites share this session and may
    // hold their own caches — training must not ADD one
    val emptyBefore = spark.sharedState.cacheManager.isEmpty
    val w = LinearClassifier.trainPerceptron(d, "text", "y", rounds = 10)
    val preds = LinearClassifier.score(d, "doc_id", "text", w)
      .join(d.select("doc_id", "y"), "doc_id")
      .filter(col("pred") =!= col("y")).count()
    preds shouldBe 0L
    spark.sharedState.cacheManager.isEmpty shouldBe emptyBefore
  }

  test("classify (one checkpointed feature pass) ≡ trainPerceptron + " +
    "score on the corpus fixture") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("y", when(col("source") === "src1", 1L).otherwise(-1L))
    val w = LinearClassifier.trainPerceptron(d, "text", "y", rounds = 3)
    val expected = LinearClassifier.score(d, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val got = LinearClassifier.classify(d, "doc_id", "text", "y",
      rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    got shouldBe expected
  }

  test("scoring is map-only: no Exchange in the plan") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = LinearClassifier.score(docs, "doc_id", "text",
      Seq.fill(17)(1L)).queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
