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

  test("d13: dup-free corpus yields all-zero dup counts; sub-window and " +
    "null-text docs drop cleanly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six seven eight nine", "s", "en", 45L),
      (2L, "ten eleven twelve thirteen fourteen fifteen sixteen " +
        "seventeen eighteen", "s", "en", 60L),
      (3L, "short doc", "s", "en", 9L), // < 8 tokens: no windows
      (4L, null: String, "s", "en", 0L) // null text: no windows
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val dir = Files.createTempDirectory("d13edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("d13_dup_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    out.map(_._1).toSeq shouldBe Seq(1L, 2L) // 3 and 4 dropped
    all(out.map(_._2)) shouldBe 0L // no cross-doc spans anywhere
    all(out.map(_._3)) shouldBe 0.0
  }

  test("m10: a query term absent from the corpus contributes zero, " +
    "docs without any query term don't rank") {
    import spark.implicits._
    // only 'join' and 'scan' exist; 'vector' and 'filter' are absent
    val docs = Seq(
      (1L, "join join scan other words here", "s", "en", 30L),
      (2L, "nothing relevant at all", "s", "en", 23L),
      (3L, "scan once", "s", "en", 9L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val dir = Files.createTempDirectory("m10edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("m10_bm25")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.keySet shouldBe Set(1L, 3L) // doc 2 matches nothing
    out(1L) should be > out(3L) // two terms + higher tf beats one
    all(out.values) should be > 0.0
  }

  test("round-13 text queries: null-text docs behave per contract — " +
    "t12/t11 drop them, t13 keeps them (nothing flagged), m12 ignores " +
    "them") {
    import spark.implicits._
    val long = Seq.fill(60)("w").mkString(" ") // 60 tokens ≥ t12's 55
    val docs = Seq(
      (1L, long, "s1", "en", long.length.toLong),
      (2L, null: String, "s1", "en", 0L),
      (3L, "a b c", "s1", "en", 5L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val dir = Files.createTempDirectory("r13edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // t12: doc 1 survives the 55-word minimum; 3 is short; null drops
    SparkEntry.queries("t12_c4_line_filters")(spark, dir)
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    // t11: null-text doc contributes no tokens and emits no row
    val t11 = SparkEntry.queries("t11_unigram_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    t11.keySet shouldBe Set(1L, 3L)
    t11(1L) shouldBe 60L
    // t13: nothing flagged anywhere — null-text doc KEPT (the d8
    // cannot-be-contaminated direction)
    SparkEntry.queries("t13_blocklist_filter")(spark, dir)
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L)
    // m12: learns from the [a-z]+ words only, null text ignored
    val m12 = SparkEntry.queries("m12_bpe_tokens")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    m12.values.sum shouldBe 63L // 60 w's + a + b + c, all as merged toks
  }

  test("x10: a null source row flows through NFC normalization as a " +
    "null group, not a crash") {
    import spark.implicits._
    val docs = Seq(
      (0L, "t", "srcA", "en", 1L),
      (1L, "t", "srcA", "en", 1L),
      (2L, "t", null: String, "en", 1L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val dir = Files.createTempDirectory("x10edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x10_nfc_dedup")(spark, dir).collect()
    // doc 0 (decomposed) and doc 1 (precomposed) merge post-NFC; the
    // null-source row groups under a null canonical term
    val nonNull = rows.filter(!_.isNullAt(0))
    nonNull.map(_.getLong(2)).sum shouldBe 2L
    nonNull.length shouldBe 1
    rows.count(_.isNullAt(0)) shouldBe 1
  }
}
