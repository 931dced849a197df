package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // u1 converts fully; u2 clicks before viewing (click must not count);
  // u3 views only; u4 never appears past stage 0
  private def ev = Seq(
    ("u1", 1L, 1L, "view"), ("u1", 2L, 2L, "click"),
    ("u1", 3L, 3L, "purchase"),
    ("u2", 1L, 4L, "click"), ("u2", 2L, 5L, "view"),
    ("u2", 3L, 6L, "click"),
    ("u3", 1L, 7L, "view"),
    ("u4", 1L, 8L, "error")
  ).toDF("user_id", "ts", "event_id", "event_type")

  private val funnel = Seq("view", "click", "purchase")

  test("stage machine: order-sensitive advancement per user") {
    val st = Funnel.stages(ev, "user_id", "ts", "event_id", funnel)
      .as[(String, Int)].collect().toMap
    st shouldBe Map("u1" -> 3, "u2" -> 2, "u3" -> 1, "u4" -> 0)
  }

  test("report: stage histogram matches the per-user stages") {
    Funnel.report(ev, "user_id", "ts", "event_id", funnel)
      .as[(Int, Long)].collect().toSeq shouldBe
      Seq((0, 1L), (1, 1L), (2, 1L), (3, 1L))
  }

  test("bot cap ≥ longest user is an identity; the prune compiles to a " +
    "map-side WindowGroupLimit") {
    val uncapped = Funnel.stages(ev, "user_id", "ts", "event_id", funnel)
      .as[(String, Int)].collect().toMap
    // cap 5 ≥ the longest user (3 events) → identity; kept BELOW the
    // fixture's total row count because RemoveRedundantWindowGroupLimits
    // strips the node when the child's maxRows ≤ the cap
    val capped = Funnel.stages(ev, "user_id", "ts", "event_id", funnel,
      maxEventsPerUser = 5)
    capped.as[(String, Int)].collect().toMap shouldBe uncapped
    capped.queryExecution.optimizedPlan.toString should include(
      "WindowGroupLimit")
  }

  test("stage types are data, not SQL: quotes and backticks are inert") {
    val weird = Seq(
      ("u1", 1L, 1L, "o'reilly `view`"), ("u1", 2L, 2L, "x' OR true OR 'y")
    ).toDF("user_id", "ts", "event_id", "event_type")
    Funnel.stages(weird, "user_id", "ts", "event_id",
      Seq("o'reilly `view`", "x' OR true OR 'y"))
      .as[(String, Int)].collect().toMap shouldBe Map("u1" -> 2)
    // an unmatched injection-looking type advances nothing
    Funnel.stages(weird, "user_id", "ts", "event_id",
      Seq("never' OR '1'='1"))
      .as[(String, Int)].collect().toMap shouldBe Map("u1" -> 0)
  }

  test("bot cap prunes to each user's FIRST N events (fold order), " +
    "demoting a conversion that happens after the cap") {
    // bot: 3 junk views, then the click+purchase arrive after event 3
    val bot = ev.union(Seq(
      ("bot", 1L, 10L, "view"), ("bot", 2L, 11L, "view"),
      ("bot", 3L, 12L, "view"), ("bot", 4L, 13L, "click"),
      ("bot", 5L, 14L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type"))
    val st = Funnel.stages(bot, "user_id", "ts", "event_id", funnel,
      maxEventsPerUser = 3).as[(String, Int)].collect().toMap
    st("bot") shouldBe 1 // saw only views within the cap
    // organic users (≤ 3 events each) are untouched
    st.filterKeys(_ != "bot").toMap shouldBe
      Map("u1" -> 3, "u2" -> 2, "u3" -> 1, "u4" -> 0)
  }
}
