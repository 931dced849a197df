package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CumsumSpec extends SparkSpec {

  test("bucketed cumsum equals the single-window global cumsum") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars")
    val (bucketed, total) =
      Cumsum.mdOrderCumsum(docs, "doc_id", "n_chars")
    val w = Window
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = docs.withColumn("__cum",
      sum(col("n_chars").cast("long")).over(w))
    val a = bucketed.select("doc_id", "__cum").orderBy("doc_id")
      .collect().map(_.toSeq)
    val b = global.select("doc_id", "__cum").orderBy("doc_id")
      .collect().map(_.toSeq)
    a shouldBe b
    total shouldBe docs.agg(sum("n_chars")).first().getLong(0)
  }

  test("null weights count as 0 — no driver NPE, cum carries past them") {
    import spark.implicits._
    val docs = Seq((1L, java.lang.Long.valueOf(10L)),
      (2L, null.asInstanceOf[java.lang.Long]),
      (3L, java.lang.Long.valueOf(5L)))
      .toDF("doc_id", "w")
    val (cum, total) = Cumsum.mdOrderCumsum(docs, "doc_id", "w")
    total shouldBe 15L
    val got = cum.select("doc_id", "__cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the null-weight row's cum equals its predecessor's (weight 0)
    got.values.max shouldBe 15L
    got.values.foreach(_ should be >= 0L)
  }

  test("execution fans out on the md5-prefix bucket, not one partition") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars")
    val plan = Cumsum.mdOrderCumsum(docs, "doc_id", "n_chars")._1
      .queryExecution.executedPlan.toString
    plan should include("hashpartitioning(__b")
    plan should not include "SinglePartition"
  }

  test("grouped cumsum equals a per-group single-window cumsum and " +
    "fans out on (group, bucket)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "n_chars")
    val bucketed = Cumsum.mdOrderCumsumBy(docs, "source", "doc_id",
      "n_chars")
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = docs.withColumn("__cum",
      sum(col("n_chars").cast("long")).over(w))
    bucketed.select("doc_id", "__cum").orderBy("doc_id")
      .collect().map(_.toSeq) shouldBe
      global.select("doc_id", "__cum").orderBy("doc_id")
        .collect().map(_.toSeq)
    val plan = bucketed.queryExecution.executedPlan.toString
    plan should include("hashpartitioning")
    plan should include("__b")
    plan should not include "SinglePartition"
  }

  test("mixture: per-source budgets fill greedily in md5 order, " +
    "crossing doc included, sources outside targets dropped") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val targets = Seq("src1" -> 0.5, "src2" -> 0.5)
    val budget = 4000L // each source budget 2000 chars
    val got = Mixture.mix(docs, "doc_id", "source", "n_chars",
      targets, budget)
    val bySrc = got.groupBy("source").agg(sum("n_chars").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.keySet shouldBe Set("src1", "src2")
    bySrc.values.foreach { t =>
      t should be >= 2000L // crossing doc included: never under budget
      t should be < (2000L + 2000L) // and overshoot < one max doc
    }
    // reference semantics: per-source window cumsum, keep while the
    // doc STARTS before the budget end
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.filter(col("source").isin("src1", "src2"))
      .withColumn("__cum", sum(col("n_chars").cast("long")).over(w))
      .filter(col("__cum") - col("n_chars") < 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    got.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe ref
    // determinism: a re-run selects the identical set
    Mixture.mix(docs, "doc_id", "source", "n_chars", targets, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe ref
  }

  test("mixWithEpochs: total delivered weight per source = " +
    "epochs·T + remainder-fill ≈ budget (crossing doc overshoot only); " +
    "repeat counts are epochs or epochs+1; sub-epoch source ≡ mix") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val targets = Seq("src1" -> 0.5, "src2" -> 0.1)
    val budget = 40000L // src1 budget 20000 (multi-epoch), src2 4000
    val got = Mixture.mixWithEpochs(docs, "doc_id", "source", "n_chars",
      targets, budget)
    val totals = docs.filter(col("source").isin("src1", "src2"))
      .groupBy("source").agg(sum(col("n_chars").cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val delivered = got
      .withColumn("w", col("n_chars").cast("long") * col("n_repeats"))
      .groupBy("source").agg(sum("w").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxW = docs.agg(max(col("n_chars").cast("long"))).head.getLong(0)
    for ((s, b) <- Seq("src1" -> 20000L, "src2" -> 4000L)) {
      delivered(s) should be >= b    // never under-delivers
      delivered(s) should be < b + maxW // crossing-doc overshoot only
      val reps = got.filter(col("source") === s)
        .select("n_repeats").collect().map(_.getLong(0)).toSet
      val e = b / totals(s)
      reps.subsetOf(Set(e, e + 1)) shouldBe true
      if (e >= 1) // full epochs ⇒ every doc present
        got.filter(col("source") === s).count() shouldBe
          docs.filter(col("source") === s).count()
    }
    // a source under one epoch degenerates to mix's selection
    val sub = Mixture.mixWithEpochs(docs, "doc_id", "source", "n_chars",
      Seq("src3" -> 0.1), budget = 20000L) // budget 2000 < T_src3
    sub.select("n_repeats").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L)
    sub.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Mixture.mix(docs, "doc_id", "source", "n_chars",
        Seq("src3" -> 0.1), budget = 20000L)
        .select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("interleave: every prefix of the ikey order holds source " +
    "ratios within one stride; deterministic; unlisted sources drop") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, if (i <= 20) "A"
      else if (i <= 30) "B" else "C")).toDF("doc_id", "source")
    val r = Mixture.interleave(docs, "doc_id", "source",
      Seq("A" -> 2L, "B" -> 1L))
      .orderBy("ikey", "source", "doc_id")
      .collect().map(x => (x.getString(1), x.getLong(3)))
    r.map(_._1).toSet shouldBe Set("A", "B") // C dropped
    // lcm 2 → strides A=1, B=2: A's ikeys 0,1,2,…; B's 0,2,4,…
    // In any prefix ending at ikey k, A has ~2× B's docs (within the
    // stride granularity): check the 2:1 ratio at every B emission.
    val seen = scala.collection.mutable.Map("A" -> 0, "B" -> 0)
    r.foreach { case (s, _) =>
      seen(s) += 1
      if (s == "B") {
        val (a, b) = (seen("A"), seen("B"))
        a should be >= 2 * b - 2
        a should be <= 2 * b + 2
      }
    }
    // determinism: identical output across runs (md5 order, no RNG)
    val again = Mixture.interleave(docs, "doc_id", "source",
      Seq("A" -> 2L, "B" -> 1L))
      .orderBy("ikey", "source", "doc_id")
      .collect().map(x => (x.getString(1), x.getLong(3)))
    again shouldBe r
  }
}
