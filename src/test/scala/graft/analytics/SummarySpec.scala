package graft.analytics

import graft.SparkSpec
import graft.vocab.Vocab
import org.apache.spark.sql.functions._

class SummarySpec extends SparkSpec {
  import spark.implicits._

  test("columnStats long-form matrix: exact min/max/mean, exact median") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Summary.columnStats(df, Seq("x")).head()
    r.getAs[String]("col_name") shouldBe "x"
    r.getAs[Double]("min_v") shouldBe 1.0
    r.getAs[Double]("max_v") shouldBe 4.0
    r.getAs[Double]("mean_v") shouldBe 2.5
    r.getAs[Double]("median_v") shouldBe 2.5 // interpolated
  }

  test("bracket-and-select exact quantiles ≡ sort-based selection " +
    "(r21 rewrite): identical on real data, heavy ties, and a " +
    "sub-accuracy frame; NaN and a 1-row band cap route to the " +
    "sort fallback with identical results") {
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    // real data: two lineitem columns at sf0.001
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice")
    Quantiles.globalQuantiles(li, cols, ps) shouldBe
      Quantiles.globalQuantilesBySort(li, cols, ps)
    // heavy ties at the median: 90% of values equal — the band
    // collapses duplicates, ranks stay exact
    val ties = (Seq.fill(900)(5.0) ++ (1 to 100).map(_.toDouble))
      .toDF("x")
    Quantiles.globalQuantiles(ties, Seq("x"), ps) shouldBe
      Quantiles.globalQuantilesBySort(ties, Seq("x"), ps)
    // a NaN forces the fallback (GK's NaN ordering ≠ sort order), and
    // the result still matches the sort path run on the same frame
    val withNan = (Seq(Double.NaN) ++ (1 to 99).map(_.toDouble)).toDF("x")
    Quantiles.globalQuantiles(withNan, Seq("x"), Seq(0.5)) shouldBe
      Quantiles.globalQuantilesBySort(withNan, Seq("x"), Seq(0.5))
    // band-cap overflow forces the fallback: cap of 1 row cannot hold
    // any band, results must still be exact
    spark.conf.set(Quantiles.MaxBandRowsConf, "1")
    try Quantiles.globalQuantiles(ties, Seq("x"), ps) shouldBe
      Quantiles.globalQuantilesBySort(ties, Seq("x"), ps)
    finally spark.conf.unset(Quantiles.MaxBandRowsConf)
  }

  test("grouped bracket-select boxplot ≡ the Window-rank form " +
    "(r21 rewrite): real data, ties, null values, all-null group, " +
    "and the fallback cap") {
    def eq(df: org.apache.spark.sql.DataFrame, v: String,
           gs: Seq[String]): Unit = {
      // stringified cells: Seq equality would fail on NaN keys even
      // when the frames agree (Scala NaN != NaN)
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      rows(Summary.boxplotStats(df, v, gs)) shouldBe
        rows(Summary.boxplotStatsBySort(df, v, gs))
    }
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    eq(li, "l_extendedprice", Seq("l_returnflag"))
    eq(li, "l_quantity", Seq("l_returnflag", "l_linestatus"))
    // ties + null values + one all-null group (must be ABSENT)
    val synth = (Seq.fill(50)(("a", Some(5.0))) ++
      (1 to 20).map(i => ("a", Some(i.toDouble))) ++
      Seq(("b", None), ("b", Some(2.0)), ("c", None), ("c", None)))
      .toDF("g", "v")
    eq(synth, "v", Seq("g"))
    Summary.boxplotStats(synth, "v", Seq("g"))
      .collect().map(_.getString(0)).toSeq shouldBe Seq("a", "b")
    // >maxGroups falls back to the Window form with identical output
    val many = (1 to 200).flatMap(g => Seq((s"g$g", 1.0), (s"g$g", 2.0)))
      .toDF("g", "v")
    eq(many, "v", Seq("g"))
    // NaN GROUP-KEY values fall back too (Spark groups NaN = NaN but
    // driver-side Scala Seq equality would not), with identical output
    val nanKey = Seq((Double.NaN, 1.0), (Double.NaN, 3.0), (2.0, 5.0))
      .toDF("g", "v")
    eq(nanKey, "v", Seq("g"))
  }

  test("boxplot stats: quartiles of 1..5 per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0))
      .toDF("g", "v")
    val r = Summary.boxplotStats(df, "v", Seq("g")).head()
    r.getAs[Double]("lo_whisker") shouldBe 1.0
    r.getAs[Double]("q25") shouldBe 2.0
    r.getAs[Double]("median") shouldBe 3.0
    r.getAs[Double]("q75") shouldBe 4.0
    r.getAs[Double]("hi_whisker") shouldBe 5.0
    r.getAs[Double]("mean") shouldBe 3.0
  }

  test("clamp caps values at hi without touching lower ones") {
    val out = Summary.clamp(Seq(0.5, 1.0, 1.7).toDF("r"), "r", 1.0)
      .collect().map(_.getDouble(0)).sorted
    out shouldBe Array(0.5, 1.0, 1.0)
  }

  test("unionWithOrigin tags and concatenates by name") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq((2, "y")).toDF("id", "v").select("v", "id") // reordered cols
    val u = Summary.unionWithOrigin(Seq(a -> "left", b -> "right"))
      .orderBy("id").collect()
    u.map(_.getAs[String]("origin")) shouldBe Array("left", "right")
    u.map(_.getAs[Int]("id")) shouldBe Array(1, 2)
  }

  test("seededSample: deterministic across runs, exact n") {
    val df = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_id")
    val s1 = Summary.seededSample(df, "event_id", 50)
      .collect().map(_.getLong(0)).toSeq
    val s2 = Summary.seededSample(df, "event_id", 50)
      .collect().map(_.getLong(0)).toSeq
    s1 shouldBe s2
    s1.length shouldBe 50
    s1.distinct.length shouldBe 50
  }

  test("percentile_approx variant tracks exact quantiles within ε at sf0.1") {
    // the documented 100 TB swap (SCALE.md): mergeable GK sketch vs the
    // exact range-partition selection. The sketch's guarantee is on RANK
    // (error ≤ n/accuracy), not value — on quantized data (l_quantity is
    // integral) one rank step is a whole unit — so the sound check is a
    // rank band: approx(p) must lie between exact(p−δ) and exact(p+δ)
    // with δ = 10× the sketch's 1/accuracy bound
    val df = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice")
    val ps = Seq(0.25, 0.5, 0.75)
    val delta = 0.001 // 10 × 1/accuracy(=10000)
    val band = ps.flatMap(p => Seq(p - delta, p, p + delta)).distinct
    val exact = Quantiles.globalQuantiles(df, cols, band)
    val approx = Quantiles.globalQuantilesApprox(df, cols, ps)
    approx.keySet shouldBe
      (for (c <- cols; p <- ps) yield (c, p)).toSet
    for (c <- cols; p <- ps) {
      val av = approx((c, p))
      val lo = exact((c, p - delta)); val hi = exact((c, p + delta))
      assert(lo <= av && av <= hi,
        s"($c,$p): approx=$av outside exact rank band [$lo, $hi]")
    }
  }

  test("spark.graft.quantiles.approx flag routes the dispatcher") {
    val df = Seq.tabulate(1000)(i => i.toDouble).toDF("x")
    val exact = Quantiles.quantiles(df, Seq("x"), Seq(0.5))(("x", 0.5))
    spark.conf.set("spark.graft.quantiles.approx", "true")
    try {
      val approx = Quantiles.quantiles(df, Seq("x"), Seq(0.5))(("x", 0.5))
      // 1000 distinct values ≪ accuracy=10k → the sketch is exact here;
      // percentile_approx returns the lower straddling value (no
      // interpolation), so allow one rank step
      math.abs(approx - exact) should be <= 1.0
    } finally spark.conf.unset("spark.graft.quantiles.approx")
  }

  test("auto-GK memory-ceiling switch: fires above the estimated-value " +
    "threshold with correct results, stays exact below it, and 0 " +
    "disables it at any size (the Verify pin)") {
    val df = Seq.tabulate(1000)(i => i.toDouble).toDF("x")
    val exact = Quantiles.quantiles(df, Seq("x"), Seq(0.5))(("x", 0.5))
    Quantiles.lastDispatch shouldBe "exact" // default threshold: 2e9 ≫ 1k
    spark.conf.set(Quantiles.AutoGkThresholdConf, "10")
    try {
      // 1000 estimated values > 10 → the dispatcher must swap to GK
      // loudly instead of paying the exact sort on an oversized column
      val auto = Quantiles.quantiles(df, Seq("x"), Seq(0.5))(("x", 0.5))
      Quantiles.lastDispatch shouldBe "gk-auto"
      math.abs(auto - exact) should be <= 1.0 // one rank step (no interp)
      // 0 disables: exact at ANY size — what graft.Verify pins so the
      // oracle gate can never silently change accuracy contracts
      spark.conf.set(Quantiles.AutoGkThresholdConf, "0")
      Quantiles.quantiles(df, Seq("x"), Seq(0.5))(("x", 0.5)) shouldBe exact
      Quantiles.lastDispatch shouldBe "exact"
      // an EXPLICIT approx=true is honored as plain gk, not gk-auto
      spark.conf.set("spark.graft.quantiles.approx", "true")
      Quantiles.quantiles(df, Seq("x"), Seq(0.5))
      Quantiles.lastDispatch shouldBe "gk"
    } finally {
      spark.conf.unset(Quantiles.AutoGkThresholdConf)
      spark.conf.unset("spark.graft.quantiles.approx")
    }
  }

  test("auto-GK never fires on a frame whose size Catalyst doesn't " +
    "know: RDD-backed leaves report the defaultSizeInBytes sentinel " +
    "and must stay exact even with a tiny threshold") {
    // LogicalRDD's computeStats is spark.sql.defaultSizeInBytes
    // (Long.MaxValue) — and Project SCALING would shrink a top-level
    // estimate below MaxValue whenever cols ⊂ schema, so this pins the
    // leaf-level sentinel test with exactly that shape: 3 columns,
    // quantiles on 1
    val rows = spark.sparkContext.parallelize(
      Seq.tabulate(100)(i => org.apache.spark.sql.Row(
        i.toDouble, i.toLong, s"r$i")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("y",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val rdd = spark.createDataFrame(rows, schema)
    spark.conf.set(Quantiles.AutoGkThresholdConf, "1")
    try {
      val m = Quantiles.quantiles(rdd, Seq("x"), Seq(0.5))(("x", 0.5))
      Quantiles.lastDispatch shouldBe "exact" // unknown size: no switch
      m shouldBe 49.5 // and the exact interpolated median
    } finally spark.conf.unset(Quantiles.AutoGkThresholdConf)
  }

  test("weighted sample: exactly n rows when no weight exceeds total/n, " +
    "and heavy rows are always included") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars")
    // documents' n_chars are all << total/50, so the grid picks exactly n
    val out = Summary.weightedSample(docs, "doc_id", "n_chars", n = 50)
    out.count() shouldBe 50L
    // a row heavier than total/n must be picked (it spans a grid point)
    val total = docs.agg(sum("n_chars")).first().getLong(0)
    val heavy = docs.unionByName(
      Seq((999999L, total)).toDF("doc_id", "n_chars"))
    Summary.weightedSample(heavy, "doc_id", "n_chars", n = 10)
      .filter(col("doc_id") === 999999L).count() shouldBe 1L
    // zero-weight rows never selected
    val zeroed = docs.withColumn("n_chars",
      when(col("doc_id") % 2 === 0, 0L).otherwise(col("n_chars")))
    Summary.weightedSample(zeroed, "doc_id", "n_chars", n = 50)
      .filter(col("doc_id") % 2 === 0).count() shouldBe 0L
  }

  test("weighted sample distributes: cumsum buckets by md5 prefix, no " +
    "global single-partition sort") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "n_chars")
    val plan = Summary.weightedSample(docs, "doc_id", "n_chars", n = 20)
      .queryExecution.executedPlan.toString
    // the window shuffles on the bucket key, never into one partition
    plan should include("hashpartitioning(__b")
    plan should not include "SinglePartition"
  }

  test("vocab: counts and descending order with tiebreak") {
    val df = Seq("the cat the dog", "the cat").toDF("text")
    val v = Vocab.generate(df, "text").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    v.head shouldBe ("the", 3L)
    v.map(_._2).sliding(2).foreach(w => w(0) should be >= w(1))
    v.toMap apply "cat" shouldBe 2L
  }
}
