package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Needs its own session (extensions bind at build time). */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  private lazy val spark: SparkSession = {
    // getOrCreate would silently reuse the suite-wide session and the
    // extensions would never bind — force a fresh session (shares the
    // SparkContext, gets its own state incl. extensions)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate registered this session as the process-wide default;
    // clear that so later TestSpark.spark getOrCreate calls don't adopt
    // it (suite-order-dependent: builder configs are NOT applied to an
    // existing default session per SPARK-31532, so adopting this one
    // would silently drop nanosAsLong for every SparkSpec suite). Our
    // lazy val keeps the reference; the SparkContext stays shared.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("syllable_count SQL function is injected") {
    spark.sql("SELECT syllable_count('readability') AS n")
      .head().getInt(0) shouldBe 5
  }

  test("optimizer rewrites the regexp syllable pattern to SyllableCount") {
    // parquet-backed input: literals and local relations are folded by
    // ConstantFolding/ConvertToLocalRelation before the plan is inspectable
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_ext")
    val df = spark.sql(
      """SELECT greatest(size(regexp_extract_all(lower(text),
        '[aeiouy]+', 0)), 1) AS n FROM docs_ext""")
    df.queryExecution.optimizedPlan.toString should include("syllable_count")
    df.count() should be > 0L
    val df2 = spark.sql(
      """SELECT greatest(1, size(regexp_extract_all(lower(text),
        '[aeiouy]+', 0))) AS n FROM docs_ext""")
    df2.queryExecution.optimizedPlan.toString should include("syllable_count")
  }

  test("simhash16 and minhash_rot SQL functions are injected") {
    spark.sql("SELECT simhash16(array('one', 'two')) AS s")
      .head().getString(0) should fullyMatch regex "[01]{16}"
    val sig = spark.sql(
      "SELECT minhash_rot(array('one', 'two', 'three'), 4) AS sig")
      .head().getSeq[String](0)
    sig should have size 4
    all(sig) should fullyMatch regex "[0-9a-f]{32}"
    // element 0 is the plain digest min; element 1 its 1-char rotation
    // family member — distinct strings from the same digest set
    sig.distinct.size should be > 1
  }

  test("shingles SQL function is injected") {
    val sh = spark.sql(
      "SELECT shingles(array('a', 'b', 'c', 'b', 'c'), 2) AS s")
      .head().getSeq[String](0)
    // windows in first-occurrence order, duplicates collapsed
    sh shouldBe Seq("a b", "b c", "c b")
    spark.sql("SELECT shingles(array('only'), 2) AS s")
      .head().getSeq[String](0) shouldBe Seq.empty
  }

  test("nfc_normalize SQL function: composes, idempotent, ascii " +
    "zero-copy, null-safe") {
    // decomposed e + U+0301 composes to precomposed U+00E9. (The
    // codepoints are Scala escapes resolved before the SQL parser sees
    // them — Spark SQL's own chr() is mod-256 ASCII and cannot build
    // U+0301, unlike DuckDB's codepoint chr.)
    spark.sql("SELECT nfc_normalize('cafe\u0301') AS s")
      .head().getString(0) shouldBe "caf\u00e9"
    // already-NFC and pure-ascii inputs are identity
    spark.sql("SELECT nfc_normalize('caf\u00e9') AS s")
      .head().getString(0) shouldBe "caf\u00e9"
    spark.sql("SELECT nfc_normalize('plain ascii') AS s")
      .head().getString(0) shouldBe "plain ascii"
    spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS s")
      .head().isNullAt(0) shouldBe true
    // interpreted path agrees with the codegen'd one, and the ascii
    // fast path is zero-copy (same instance back)
    import org.apache.spark.unsafe.types.UTF8String
    graft.functions.NfcNormalize.nfc(
      UTF8String.fromString("cafe\u0301")).toString shouldBe "caf\u00e9"
    val ascii = UTF8String.fromString("abc")
    (graft.functions.NfcNormalize.nfc(ascii) eq ascii) shouldBe true
  }

  test("nfc_normalize known-answer stress: Hangul jamo compose, " +
    "singleton decompositions map, NFC-invariant compatibility chars " +
    "stay") {
    import org.apache.spark.unsafe.types.UTF8String
    def nfc(x: String): String =
      graft.functions.NfcNormalize.nfc(UTF8String.fromString(x)).toString
    // Hangul L+V jamo compose algorithmically: U+1100 U+1161 -> U+AC00
    nfc("\u1100\u1161") shouldBe "\uac00"
    // L+V+T: U+1100 U+1161 U+11A8 -> U+AC01
    nfc("\u1100\u1161\u11a8") shouldBe "\uac01"
    // singletons: ANGSTROM SIGN U+212B -> Å U+00C5; OHM SIGN U+2126 ->
    // GREEK CAPITAL OMEGA U+03A9 (canonical, not compatibility)
    nfc("\u212b") shouldBe "\u00c5"
    nfc("\u2126") shouldBe "\u03a9"
    // NFC is canonical-only: ligature fi U+FB01 and fullwidth A U+FF21
    // are COMPATIBILITY decompositions and must NOT change
    nfc("\ufb01") shouldBe "\ufb01"
    nfc("\uff21") shouldBe "\uff21"
    // combining-mark reordering: dot-below (ccc 220) + circumflex
    // (ccc 230) on 'a' in either order normalize to the same bytes
    nfc("a\u0323\u0302") shouldBe nfc("a\u0302\u0323")
  }

  test("nfc_normalize over a non-foldable column exercises the codegen " +
    "path") {
    // Literal arguments constant-fold through the interpreted
    // nullSafeEval before codegen runs; a real column forces doGenCode
    // (and its static-forwarder call) through WholeStageCodegen, so a
    // codegen regression fails HERE, not first in the x10 query.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // repartition blocks ConvertToLocalRelation from folding the
    // project into a LocalTableScan via the interpreted path — the
    // select must survive as a WholeStageCodegen Project
    val df = Seq("café", "café", "plain", null)
      .toDF("t").repartition(1)
      .select(graft.functions.NfcNormalize(col("t")).as("s"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else
      r.getString(0))
    // assert AFTER the action: AQE finalizes (and codegens) the plan
    // only on execution. The simple plan string marks a whole-stage-
    // codegen'd operator with a "*(n)" prefix — the Project carrying
    // nfc_normalize must have one.
    df.queryExecution.executedPlan.toString should include regex
      raw"\*\(\d+\) Project \[nfc_normalize"
    got shouldBe Array("café", "café", "plain", null)
  }

  test("other greatest/regexp shapes are left untouched") {
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("docs_ext2")
    val df = spark.sql(
      """SELECT greatest(size(regexp_extract_all(lower(text),
        '[abc]+', 0)), 1) AS n FROM docs_ext2""")
    df.queryExecution.optimizedPlan.toString should not include
      "syllable_count"
  }
}
