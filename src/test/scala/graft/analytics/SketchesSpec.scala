package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("CMS estimate is one-sided: est >= true count for every token") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val distinct = docs
      .select(explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").distinct().count()
    val top = Sketches.cmsTopK(docs, "text", depth = 4, hexChars = 3,
      k = 50).collect()
    top.length shouldBe math.min(50L, distinct) // synthetic vocab is small
    top.foreach { r =>
      r.getLong(1) should be >= r.getLong(2) // est >= true_n
    }
  }

  test("CMS top-1 matches the exact top-1 on a skewed stream") {
    // one token ('hot') dominates — the sketch cannot miss it: its
    // counters are >= its true count and every other token's estimate
    // is bounded by bucket mass << hot's count at this width
    val docs = (1 to 400).map(i => s"hot tail$i").toDF("text")
    val top = Sketches.cmsTopK(docs, "text", depth = 4, hexChars = 3,
      k = 1).collect()
    top.head.getString(0) shouldBe "hot"
    top.head.getLong(2) shouldBe 400L // exact count rides along
  }

  test("sketch row output is bounded by the width") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = docs.select(
      explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val row = Sketches.cmsRow(toks, "tok", 0, hexChars = 2)
    row.count() should be <= 256L // 16^2 counters max
    // counter mass conservation: the sketch row sums to the stream size
    row.agg(sum("__c0")).first().getLong(0) shouldBe toks.count()
  }

  test("sketch of a union == elementwise sum of shard sketches (merge)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = docs.select(
      explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val Array(a, b) = toks.randomSplit(Array(0.5, 0.5), seed = 42)
    val whole = Sketches.cmsRow(toks, "tok", 1, hexChars = 2)
      .orderBy("__b").collect().map(r => (r.getString(0), r.getLong(1)))
    val merged = Sketches.mergeRow(
      Sketches.cmsRow(a, "tok", 1, hexChars = 2),
      Sketches.cmsRow(b, "tok", 1, hexChars = 2), 1)
      .orderBy("__b").collect().map(r => (r.getString(0), r.getLong(1)))
    merged shouldBe whole
  }

  test("estimate joins are broadcasts (counter tables never shuffle)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = Sketches.cmsTopK(docs, "text")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }
}
