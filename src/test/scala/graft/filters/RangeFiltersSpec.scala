package graft.filters

import graft.SparkSpec
import graft.filters.RangeFilters.RangeFilter

class RangeFiltersSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(-2, -1, 0, 5, 10, 11, 100).toDF("x")

  test("bounds are exclusive (reference filter_base.py:16)") {
    val out = RangeFilters(df, Seq(RangeFilter("x", Some(0), Some(11))))
      .collect().map(_.getInt(0))
    out.sorted shouldBe Array(5, 10) // 0 and 11 excluded
  }

  test("default min is -1 (exclusive), default max is huge") {
    val out = RangeFilters(df, Seq(RangeFilter("x")))
      .collect().map(_.getInt(0))
    out.sorted shouldBe Array(0, 5, 10, 11, 100) // -1 itself excluded
  }

  test("missing column fails fast at plan build") {
    an[IllegalArgumentException] should be thrownBy
      RangeFilters(df, Seq(RangeFilter("nope", Some(0), None)))
  }

  test("conjunctive chain = intersection") {
    val out = RangeFilters(df, Seq(
      RangeFilter("x", Some(-2), None),
      RangeFilter("x", None, Some(11))))
      .collect().map(_.getInt(0))
    // second filter's default min=-1 (reference default) excludes -1 too
    out.sorted shouldBe Array(0, 5, 10)
  }

  test("filters are pushed into the parquet scan (scale sanity)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val plan = RangeFilters(li, Seq(RangeFilter("l_quantity", Some(5), Some(45))))
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThan(l_quantity,5.0)")
  }
}
