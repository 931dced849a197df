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
}
