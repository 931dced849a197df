package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Edge-case regressions for queries whose oracle data can't exhibit the
  * degenerate input (the sf tables carry no null text), driven through the
  * same `SparkEntry.queries` entry the driver runs. */
class QueriesEdgeSpec extends SparkSpec {

  test("x7: null-text rows don't consume rank-prune slots (nulls sort first)") {
    import spark.implicits._
    // 2500 null-text docs sort FIRST ascending — without the isNotNull
    // pre-filter they'd eat every row_number() <= 2000 slot and evict the
    // real rows, while contributing nothing to the cumulative length the
    // unpruned query (and the DuckDB oracle) actually filters on.
    val nulls = (1 to 2500).map(i => ("xx", i.toLong, null: String))
    val real = Seq(("xx", 9001L, "alpha beta."), ("xx", 9002L, "gamma delta."),
      ("yy", 1L, "other language."))
    val dir = Files.createTempDirectory("x7nulls").toString
    (nulls ++ real).toDF("lang", "doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x7_corpus_concat")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    // reference semantics: nulls vanish from the concat but count in n_docs
    out("xx")._1 shouldBe "alpha beta. gamma delta."
    out("xx")._2 shouldBe 2502L
    out("yy")._1 shouldBe "other language."
  }
}
