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

  test("vocab: counts and descending order with tiebreak") {
    val df = Seq("the cat the dog", "the cat").toDF("text")
    val v = Vocab.generate(df, "text").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    v.head shouldBe ("the", 3L)
    v.map(_._2).sliding(2).foreach(w => w(0) should be >= w(1))
    v.toMap apply "cat" shouldBe 2L
  }
}
