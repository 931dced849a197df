package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(nodes: Seq[String], edges: Seq[(String, String)],
                    iters: Int): Map[String, Long] =
    PageRank.pagerank(nodes.toDF("node"), edges.toDF("src", "dst"), iters)
      .as[(String, Long)].collect().toMap

  test("star graph: hand-computed exact fixed-point ranks") {
    // a→c, b→c; out-degree 1 each, c dangling.
    // iter 1: inc(c)=2_000_000 → r(c)=150000+(85·2000000)DIV 100=1850000
    //         a, b: no incoming → 150000
    // iter 2: inc(c)=300000 → r(c)=150000+255000=405000
    val r1 = ranks(Seq("a", "b", "c"), Seq("a" -> "c", "b" -> "c"), 1)
    r1 shouldBe Map("a" -> 150000L, "b" -> 150000L, "c" -> 1850000L)
    val r2 = ranks(Seq("a", "b", "c"), Seq("a" -> "c", "b" -> "c"), 2)
    r2 shouldBe Map("a" -> 150000L, "b" -> 150000L, "c" -> 405000L)
  }

  test("out-degree splits contributions by integer division") {
    // a→b, a→c: each gets 1_000_000 DIV 2 = 500_000
    // r(b)=r(c)=150000+(85·500000)DIV 100=575000
    val r = ranks(Seq("a", "b", "c"), Seq("a" -> "b", "a" -> "c"), 1)
    r("b") shouldBe 575000L
    r("c") shouldBe 575000L
    // truncation is explicit: odd rank DIV 2 drops the half unit
    // (the documented fixed-point contract), never rounds
    val r2 = ranks(Seq("a", "b", "c"),
      Seq("a" -> "b", "a" -> "c", "b" -> "a"), 2)
    // iter1: r(a)=150000+85·1000000 DIV 100=1000000 (b→a full rank);
    //        r(b)=r(c)=575000
    // iter2: a contributes 1000000 DIV 2=500000 to b and c;
    //        b contributes 575000 to a
    r2("a") shouldBe 150000L + (85L * 575000L) / 100L
    r2("b") shouldBe 150000L + (85L * 500000L) / 100L
  }

  test("checkpointEvery: ranks identical to the lazy plan, and 50 " +
    "iterations return a bounded (checkpoint-rooted) plan") {
    val rng = new scala.util.Random(11)
    val nodes = (0 until 20).map(i => s"n$i")
    val edges = (0 until 20).flatMap(i => (0 until 2).map(_ =>
      (s"n$i", s"n${rng.nextInt(20)}"))).distinct
    // truncation must never change arithmetic
    val plain = ranks(nodes, edges, 6)
    PageRank.pagerank(nodes.toDF("node"), edges.toDF("src", "dst"),
      iters = 6, checkpointEvery = 2)
      .as[(String, Long)].collect().toMap shouldBe plain
    // 50 unrolled iterations would be a thousand-node plan; with
    // periodic truncation the returned frame roots at a checkpoint RDD
    val deep = PageRank.pagerank(nodes.toDF("node"),
      edges.toDF("src", "dst"), iters = 50, checkpointEvery = 5)
    deep.queryExecution.optimizedPlan.numberedTreeString
      .linesIterator.size should be <= 5
    val got = deep.as[(String, Long)].collect()
    got.length shouldBe 20
    all(got.map(_._2)) should be >= 150000L
  }

  test("cycle conserves ordering and stays exact over many iterations") {
    // a→b→c→a: perfectly symmetric, so all ranks stay equal — any
    // divergence would expose order-dependent arithmetic
    val r = ranks(Seq("a", "b", "c"),
      Seq("a" -> "b", "b" -> "c", "c" -> "a"), 5)
    r.values.toSet.size shouldBe 1
  }
}
