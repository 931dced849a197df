package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LimitsSpec extends SparkSpec {

  test("capPerKey: keeps the lowest `cap` order values per key, " +
    "deterministic, other keys untouched") {
    import spark.implicits._
    val d = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"),
      (7L, "c")).toDF("doc_id", "host")
    val kept = Limits.capPerKey(d, "host", "doc_id", cap = 2)
      .orderBy("doc_id").collect().map(_.getLong(0))
    kept shouldBe Array(1L, 2L, 5L, 6L, 7L)
    // a second run keeps exactly the same rows
    Limits.capPerKey(d, "host", "doc_id", cap = 2)
      .orderBy("doc_id").collect().map(_.getLong(0)) shouldBe kept
    // the helper column does not leak
    Limits.capPerKey(d, "host", "doc_id", 2).columns shouldBe
      Array("doc_id", "host")
  }

  test("capPerKey plans a map-side WindowGroupLimit: each partition " +
    "prunes a key to its own top-cap before the shuffle") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"))
    val plan = Limits.capPerKey(d, "source", "doc_id", 10)
      .queryExecution.executedPlan.toString
    plan should include("WindowGroupLimit")
  }
}
