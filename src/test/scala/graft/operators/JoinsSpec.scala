package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  // left: lookups at t=5,10,20 on key a (plus a key with no right rows);
  // right: quotes at t=3,10,15 on key a
  private def left = Seq(
    ("a", 5L, 100L), ("a", 10L, 101L), ("a", 20L, 102L), ("b", 7L, 103L)
  ).toDF("k", "ts", "lid")
  private def right = Seq(
    ("a", 3L, 1.0, 1L), ("a", 10L, 2.0, 2L), ("a", 15L, 3.0, 3L)
  ).toDF("k", "ts", "px", "rid")

  test("asof: greatest right ts <= left ts per key; no prior -> null") {
    val out = Joins.asofJoin(left, right, "k", "ts", "rid", Seq("px"))
      .orderBy("lid").collect()
    out.map(r => (r.getLong(2), Option(r.get(3)))).toSeq shouldBe Seq(
      (100L, Some(1.0)), // t=5 -> quote at 3
      (101L, Some(2.0)), // t=10 -> quote AT 10 (<= includes the instant)
      (102L, Some(3.0)), // t=20 -> quote at 15
      (103L, None))      // key b: no right rows at all
  }

  test("asof: ties on right ts break by the greatest tie column") {
    val dupRight = right.union(
      Seq(("a", 10L, 9.9, 9L)).toDF("k", "ts", "px", "rid"))
    val out = Joins.asofJoin(left, dupRight, "k", "ts", "rid", Seq("px"))
      .filter(col("lid") === 101L).first()
    out.getDouble(3) shouldBe 9.9 // rid 9 > rid 2 at ts=10
  }

  test("asof: shared column names don't collide; plan has no join node") {
    // both sides are slices of the same frame — every column name shared
    val ev = Seq(("a", 1L, 10.0, 1L), ("a", 2L, 20.0, 2L),
      ("a", 3L, 30.0, 3L)).toDF("k", "ts", "v", "id")
    val joined = Joins.asofJoin(
      ev.filter(col("id") =!= 2L), ev.filter(col("id") === 2L),
      "k", "ts", "id", Seq("v", "id"))
    val rows = joined.orderBy("id").collect()
    rows.map(r => (r.getLong(3), Option(r.get(4)))).toSeq shouldBe Seq(
      (1L, None), (3L, Some(20.0)))
    // union+window form: ONE sort per key, zero join operators
    val plan = joined.queryExecution.executedPlan.toString
    plan should not include "Join"
  }

  test("asof differential: equals the naive inequality-join formulation " +
    "on seeded random data (ties, gaps, matchless keys)") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(1234)
    for (_ <- 1 to 3) {
      // small key/ts domains force every interesting case: equal-ts
      // ties on the right, left rows before any right row, keys with
      // no right rows at all (k5 appears only on the right)
      val l = (1 to 80).map(i =>
        (s"k${rng.nextInt(5)}", rng.nextInt(20).toLong, i.toLong))
        .toDF("k", "ts", "lid")
      val r = (1 to 60).map(i =>
        (s"k${rng.nextInt(6)}", rng.nextInt(20).toLong,
          rng.nextDouble(), i.toLong))
        .toDF("k", "ts", "px", "rid")
      val fast = Joins.asofJoin(l, r, "k", "ts", "rid", Seq("px", "rid"))
        .select("lid", "r_px", "r_rid")
        .orderBy("lid").collect().map(_.toSeq)
      val naive = l.join(
          r.withColumnRenamed("k", "rk").withColumnRenamed("ts", "rts"),
          col("k") === col("rk") && col("rts") <= col("ts"), "left")
        .withColumn("rn", row_number().over(Window.partitionBy("lid")
          .orderBy(desc_nulls_last("rts"), desc_nulls_last("rid"))))
        .filter(col("rn") === 1)
        .select(col("lid"), col("px").as("r_px"), col("rid").as("r_rid"))
        .orderBy("lid").collect().map(_.toSeq)
      fast shouldBe naive
    }
  }

  test("asof: null right ts never matches; null left ts gets no match") {
    // a null-ts right row must NOT become the fallback match for left
    // rows with no prior right row (SQL inequality semantics: null ts
    // matches nothing); a null-ts left row has no prior match either
    val nullRight = right.union(
      Seq(("b", Option.empty[Long], 7.7, 70L)).toDF("k", "ts", "px", "rid"))
    val nullLeft = left.union(
      Seq(("a", Option.empty[Long], 104L)).toDF("k", "ts", "lid"))
    val out = Joins.asofJoin(nullLeft, nullRight, "k", "ts", "rid",
      Seq("px")).orderBy("lid").collect()
    out.map(r => (r.getLong(2), Option(r.get(3)))).toSeq shouldBe Seq(
      (100L, Some(1.0)), (101L, Some(2.0)), (102L, Some(3.0)),
      (103L, None), // key b: its only right row has null ts -> no match
      (104L, None)) // null left ts: no prior right row by definition
  }

  test("range join: inclusive [ts-w, ts] band, each pair exactly once") {
    val l = Seq(("a", 100L, 1L), ("a", 200L, 2L), ("b", 100L, 3L))
      .toDF("k", "ts", "lid")
    val r = Seq(("a", 0L, 10L), ("a", 100L, 11L), ("a", 150L, 12L),
      ("a", 201L, 13L), ("b", 5L, 14L)).toDF("k", "ts", "rid")
    val out = Joins.rangeJoin(l, r, "k", "ts", 100L, Seq("rid"))
      .select("lid", "r_rid").orderBy("lid", "r_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    out.toSeq shouldBe Seq(
      (1L, 10L),            // 0 in [0,100]  (inclusive lower bound)
      (1L, 11L),            // 100 in [0,100] (inclusive upper bound)
      (2L, 11L), (2L, 12L), // 100,150 in [100,200]; 201 is out
      (3L, 14L))            // keys don't mix
  }

  test("range join differential: equals the naive inequality join on " +
    "seeded random data, and plans as an equi-join (no nested loop)") {
    val rng = new scala.util.Random(77)
    val l = (1 to 120).map(i =>
      (s"k${rng.nextInt(4)}", rng.nextInt(500).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val r = (1 to 150).map(i =>
      (s"k${rng.nextInt(5)}", rng.nextInt(500).toLong, i.toLong))
      .toDF("k", "ts", "rid")
    val fast = Joins.rangeJoin(l, r, "k", "ts", 60L, Seq("rid"))
    val got = fast.select("lid", "r_rid").orderBy("lid", "r_rid")
      .collect().map(_.toSeq)
    val naive = l.join(
        r.withColumnRenamed("k", "rk").withColumnRenamed("ts", "rts"),
        col("k") === col("rk") && col("rts") >= col("ts") - 60L &&
          col("rts") <= col("ts"))
      .select(col("lid"), col("rid").as("r_rid"))
      .orderBy("lid", "r_rid").collect().map(_.toSeq)
    got shouldBe naive
    // the time-cell key makes it a plain equi-join: a hot key spreads
    // across its timeline instead of one quadratic sort-merge group
    val plan = fast.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("range join: exact cells at epoch-µs magnitude (no double-division " +
    "boundary flips)") {
    // ts/W in doubles errs by ~1e-7 at 1.7e15 µs — enough to flip a floor
    // at a cell boundary and break the adjacent-cell guarantee. These rows
    // sit exactly ON hour boundaries at realistic epoch values.
    val w = 3600L * 1000000L
    val base = 1754000000000000L // ~2025 in epoch-µs, a multiple of 1000
    val k = base - base % w      // exact hour boundary
    val l = Seq(("u", k + w, 1L), ("u", k + w + 1L, 2L))
      .toDF("k", "ts", "lid")
    val r = Seq(("u", k, 10L), ("u", k + 1L, 11L), ("u", k + w, 12L))
      .toDF("k", "ts", "rid")
    val out = Joins.rangeJoin(l, r, "k", "ts", w, Seq("rid"))
      .select("lid", "r_rid").orderBy("lid", "r_rid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    out.toSeq shouldBe Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // [k, k+w]: boundary row k included
      (2L, 11L), (2L, 12L))            // [k+1, k+w+1]: k now excluded
  }

  test("bucketed asof ≡ asofJoin on seeded random data incl. a monster " +
    "key, across bucket widths") {
    val rng = new scala.util.Random(4242)
    // k0 is the monster: 200 of 280 left rows and 150 of 210 right rows
    // land on it — the hot-key shape the bucketing exists to split
    val l = ((1 to 200).map(i => ("k0", rng.nextInt(40).toLong, i.toLong))
      ++ (201 to 280).map(i =>
        (s"k${1 + rng.nextInt(4)}", rng.nextInt(40).toLong, i.toLong)))
      .toDF("k", "ts", "lid")
    val r = ((1 to 150).map(i =>
      ("k0", rng.nextInt(40).toLong, rng.nextDouble(), i.toLong))
      ++ (151 to 210).map(i => (s"k${1 + rng.nextInt(5)}",
        rng.nextInt(40).toLong, rng.nextDouble(), i.toLong)))
      .toDF("k", "ts", "px", "rid")
    val want = Joins.asofJoin(l, r, "k", "ts", "rid", Seq("px", "rid"))
      .select("lid", "r_px", "r_rid")
      .orderBy("lid").collect().map(_.toSeq)
    // bucket 1 = one ts per bucket (all matches cross buckets); 7 =
    // mid; 1000 = everything in one bucket (degenerates to asofJoin)
    for (b <- Seq(1L, 7L, 1000L)) {
      val got = Joins.asofJoinBucketed(l, r, "k", "ts", "rid",
        Seq("px", "rid"), bucketMicros = b)
        .select("lid", "r_px", "r_rid")
        .orderBy("lid").collect().map(_.toSeq)
      got shouldBe want
    }
  }

  test("bucketed asof: carry crosses empty buckets; nulls keep asof " +
    "semantics") {
    // right row only in bucket 0; left rows live 5+ empty buckets later
    val l = Seq(("a", 57L, 1L), ("a", 93L, 2L), ("b", 40L, 3L))
      .toDF("k", "ts", "lid")
    val r = Seq(("a", 3L, 1.5, 1L)).toDF("k", "ts", "px", "rid")
    val out = Joins.asofJoinBucketed(l, r, "k", "ts", "rid", Seq("px"),
      bucketMicros = 10L).orderBy("lid").collect()
    out.map(x => (x.getLong(2), Option(x.get(3)))).toSeq shouldBe Seq(
      (1L, Some(1.5)), (2L, Some(1.5)), (3L, None))
    // null-ts rows: right never matches, left matches nothing
    val nl = l.union(Seq(("a", Option.empty[Long], 4L)).toDF("k", "ts", "lid"))
    val nr = r.union(
      Seq(("b", Option.empty[Long], 9.9, 9L)).toDF("k", "ts", "px", "rid"))
    val out2 = Joins.asofJoinBucketed(nl, nr, "k", "ts", "rid", Seq("px"),
      bucketMicros = 10L).orderBy("lid").collect()
    out2.map(x => (x.getLong(2), Option(x.get(3)))).toSeq shouldBe Seq(
      (1L, Some(1.5)), (2L, Some(1.5)), (3L, None), (4L, None))
  }

  test("trailing range count: frame is value-based [ts-w, ts]") {
    val ev = Seq(
      ("u", 0L, "x", 1L), ("u", 50L, "e", 2L), ("u", 100L, "e", 3L),
      ("u", 149L, "x", 4L), ("u", 151L, "x", 5L), ("v", 100L, "e", 6L)
    ).toDF("k", "ts", "typ", "id")
    val out = Joins.trailingCount(ev, "k", "ts",
      col("typ") === "e", 100L, "n")
      .orderBy("id").collect()
    // id4 @149: errors at 50,100 in [49,149] -> 2
    // id5 @151: error at 50 now outside [51,151] -> 1
    out.map(r => (r.getLong(3), r.getLong(4))).toSeq shouldBe Seq(
      (1L, 0L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 1L), (6L, 1L))
  }
}
