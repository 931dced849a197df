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

  test("approx variant finds the exact top-k on a heavy-tailed stream") {
    // 10 hot tokens with counts 4000..400 over a 2000-token unique tail:
    // every hot token's count is far above N/(capacity+1), so each
    // survives some partition's Misra-Gries summary, and CMS ordering
    // keeps them ahead of the tail at this width
    val rows = (0 until 10).flatMap(h =>
      Seq.fill(4000 - 360 * h)(s"hot$h")) ++
      (1 to 2000).map(i => s"tail$i")
    val docs = rows.toDF("text").repartition(8)
    val approx = Sketches.cmsTopKApprox(docs, "text", depth = 4,
      hexChars = 3, k = 10, capacity = 256).collect()
    approx.map(_.getString(0)).sorted shouldBe
      (0 until 10).map(h => s"hot$h")
    // one-sided estimates: each hot token's est >= its true count
    val trueN = (0 until 10).map(h => s"hot$h" -> (4000 - 360 * h)).toMap
    approx.foreach(r =>
      r.getLong(1) should be >= trueN(r.getString(0)).toLong)
  }

  test("local heavy hitters are bounded by partitions x capacity and " +
    "retain every token above the Misra-Gries threshold") {
    val toks = ((1 to 500).map(_ => "alpha") ++ (1 to 300).map(_ => "beta")
      ++ (1 to 900).map(i => s"u$i")).toDF("tok").repartition(4)
    val out = Sketches.localHeavyHitters(toks, "tok", capacity = 64)
    out.count() should be <= 4L * 64L
    // alpha and beta dominate N/(capacity+1) in every split
    val kept = out.distinct().collect().map(_.getString(0)).toSet
    kept should contain allOf ("alpha", "beta")
  }

  test("estimate joins are broadcasts (counter tables never shuffle)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = Sketches.cmsTopK(docs, "text")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("HLL registers: exactly m rows, empty registers at rho 0") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"))
    val regs = Sketches.hllRegisters(ev, "event_id", hexChars = 2)
    regs.count() shouldBe 256L
    regs.agg(min("rho")).first().getInt(0) should be >= 0
    // a single-value stream fills exactly one register
    val one = Sketches.hllRegisters(
      Seq("x").toDF("v"), "v", hexChars = 2)
    one.filter(col("rho") > 0).count() shouldBe 1L
  }

  test("HLL merge: sketch of a union == elementwise max of shards") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_id"))
    val Array(a, b) = ev.randomSplit(Array(0.5, 0.5), seed = 7)
    val whole = Sketches.hllRegisters(ev, "event_id")
      .orderBy("reg").collect().map(r => (r.getString(0), r.getInt(1)))
    val merged = Sketches.hllRegisters(a, "event_id")
      .unionByName(Sketches.hllRegisters(b, "event_id"))
      .groupBy("reg").agg(max("rho").as("rho"))
      .orderBy("reg").collect().map(r => (r.getString(0), r.getInt(1)))
    merged shouldBe whole
  }

  test("HLL estimate lands within 20% of the exact distinct count") {
    // event_id is unique, so true n = row count (1500 at sf0.001) — well
    // past the 2.5m linear-counting zone for m=256; the standard error
    // at m=256 is 1.04/sqrt(256) = 6.5%
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val n = ev.count().toDouble
    val est = Sketches.hllSummary(ev, "event_id", hexChars = 2)
      .first().getAs[Double]("est_distinct")
    math.abs(est - n) / n should be < 0.20
  }

  test("HLL register build shuffles counters, not values") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val plan = Sketches.hllSummary(ev, "event_id")
      .queryExecution.executedPlan.toString
    // the only wide exchange is the register groupBy (<= m rows per
    // task after partial agg); the domain join must broadcast
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }
}
