package graft.plans

import graft.SparkSpec
import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).map(_.toSeq).toSeq
      .sortBy(_.mkString(""))

  test("native merge as-of ≡ union+window asofJoin on generated data " +
    "(incl. ties, no-match rows, null left ts)") {
    val rng = new scala.util.Random(11)
    val left = (1 to 400).map { i =>
      (i.toLong, rng.nextInt(12).toLong,
        if (i % 37 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rng.nextInt(1000).toLong))
    }.toDF("l_id", "k", "ts")
    val right = (1 to 300).map { i =>
      (1000L + i, rng.nextInt(12).toLong,
        if (i % 41 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rng.nextInt(1000).toLong),
        rng.nextInt(100).toLong)
    }.toDF("r_id", "k", "ts", "v")
    val native = NativeAsOf.asofJoin(left, right, "k", "ts", "r_id",
      Seq("v", "r_id"))
    val window = Joins.asofJoin(left, right, "k", "ts", "r_id",
      Seq("v", "r_id"))
    canon(native) shouldBe canon(window)
    // non-trivial fixture: some rows matched, some not
    native.filter(col("r_v").isNotNull).count() should be > 0L
    native.filter(col("r_v").isNull).count() should be > 0L
    native.count() shouldBe 400L
  }

  test("self-join shape (both sides from one source, j11's): shared " +
    "exprIds are re-aliased, results match the window form") {
    val ev = graft.util.Timestamps.normalizeEventTs(
        spark.read.parquet(s"$sf0001/events.parquet"), "ts")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        col("value"))
    val right = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts_us").agg(max("value").as("r_value"))
    val left = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val native = NativeAsOf.asofJoin(left, right, "user_id", "ts_us",
      "ts_us", Seq("r_value"))
      .select("event_id", "r_r_value")
    val window = Joins.asofJoin(left, right, "user_id", "ts_us",
      "ts_us", Seq("r_value"))
      .select("event_id", "r_r_value")
    canon(native) shouldBe canon(window)
    native.count() should be > 0L
  }

  test("physical plan: MergeAsOfJoinExec with EnsureRequirements-" +
    "inserted clustering + per-side (key, ts) sorts, no join node") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "ts")
    val r = Seq((1L, 5L, 7L)).toDF("k", "ts", "v")
    val df = NativeAsOf.asofJoin(l, r, "k", "ts", "v", Seq("v"))
    val plan = df.queryExecution.executedPlan.toString
    plan should include("MergeAsOfJoin")
    plan should include("Sort")
    plan should include("Exchange hashpartitioning(k")
    plan should not include "SortMergeJoin"
    plan should not include "BroadcastHashJoin"
  }

  test("asof contract survives the native path: inclusive <=, greatest " +
    "tie wins, right null ts dropped") {
    val l = Seq((1L, 100L), (1L, 50L), (2L, 10L)).toDF("k", "ts")
    val r = Seq[(Long, java.lang.Long, Long, Long)](
      (1L, java.lang.Long.valueOf(100L), 1L, 11L), // at the instant: <=
      (1L, java.lang.Long.valueOf(100L), 2L, 22L), // same ts, tie wins
      (1L, java.lang.Long.valueOf(60L), 3L, 33L),
      (2L, null, 4L, 44L) // null ts: never matches
    ).toDF("k", "ts", "tie", "v")
    val out = NativeAsOf.asofJoin(l, r, "k", "ts", "tie", Seq("v"))
      .collect().map(row => (row.getLong(0), row.getLong(1),
        Option(row.get(2)).map(_.asInstanceOf[Long]))).toSet
    out shouldBe Set(
      (1L, 100L, Some(22L)), // tie-broken to the greater tie row
      (1L, 50L, None),       // only later right rows exist
      (2L, 10L, None))       // the null-ts right row never matches
  }
}
