package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("case, default port, fragment, trailing slash all normalize away") {
    canon(
      "HTTPS://Example.ORG/wiki/Page",
      "https://example.org:443/wiki/Page",
      "https://example.org/wiki/Page/",
      "https://example.org//wiki///Page",
      "https://example.org/wiki/Page#section-3"
    ).distinct shouldBe Seq("https://example.org/wiki/Page")
  }

  test("tracking params drop, surviving params sort, empty query folds") {
    canon(
      "https://example.org/p?b=2&a=1",
      "https://example.org/p?a=1&b=2",
      "https://example.org/p?utm_source=feed&b=2&utm_medium=x&a=1",
      "https://example.org/p?fbclid=XYZ&a=1&b=2"
    ).distinct shouldBe Seq("https://example.org/p?a=1&b=2")
    canon("https://example.org/p?utm_source=feed",
      "https://example.org/p").distinct shouldBe
      Seq("https://example.org/p")
  }

  test("a '?' inside the fragment is NOT a query; bare tracking params " +
    "drop") {
    // '#sec?x=1' is all fragment — canonical form must equal the bare page
    canon("https://example.org/p#sec?x=1",
      "https://example.org/p").distinct shouldBe
      Seq("https://example.org/p")
    // and must NOT collide with the genuinely different real query
    canon("https://example.org/p#sec?x=1").head should not be
      canon("https://example.org/p?x=1").head
    // valueless tracking params are tracking noise too
    canon("https://example.org/p?a=1&fbclid",
      "https://example.org/p?fbclid&a=1&utm_source",
      "https://example.org/p?a=1").distinct shouldBe
      Seq("https://example.org/p?a=1")
  }

  test("query starts at the FIRST '?' (RFC 3986) — a literal '?' in a " +
    "param value stays in the query") {
    // '/p?a=1?b=2' has query 'a=1?b=2' (one param, value '1?b=2') — it
    // must NOT collapse to '/p?b=2' (the greedy-last-'?' bug) nor drop
    // the whole query on a trailing '?'
    canon("https://example.org/p?a=1?b=2").head shouldBe
      "https://example.org/p?a=1?b=2"
    canon("https://example.org/p?a=1?b=2").head should not be
      canon("https://example.org/p?b=2").head
    canon("https://example.org/p?a=1?").head shouldBe
      "https://example.org/p?a=1?"
    // first-'?' start composes with fragment stripping
    canon("https://example.org/p?a=1?b=2#frag").head shouldBe
      "https://example.org/p?a=1?b=2"
  }

  test("distinct pages stay distinct") {
    canon(
      "https://example.org/p?a=1",
      "https://example.org/p?a=2",
      "https://example.org/q?a=1",
      "http://example.org/p?a=1", // scheme differs
      "https://sub.example.org/p?a=1"
    ).distinct.length shouldBe 5
  }

  test("non-default port and scheme-mismatched port survive") {
    canon("https://example.org:8443/p").head shouldBe
      "https://example.org:8443/p"
    // :443 is only default for https, not http
    canon("http://example.org:443/p").head shouldBe
      "http://example.org:443/p"
    canon("http://example.org:80/p").head shouldBe "http://example.org/p"
  }

  test("bare host and root path canonicalize to a single form") {
    canon("https://example.org", "https://example.org/",
      "https://example.org:443").distinct shouldBe
      Seq("https://example.org/")
  }

  test("canonicalization is idempotent on generated URLs (the invariant " +
    "that licenses dedup on the canonical form)") {
    import org.scalacheck.Gen
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val url: Gen[String] = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "Https")
      host <- Gen.listOfN(2, seg).map(_.mkString("."))
      caseHost <- Gen.oneOf(host, host.toUpperCase)
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.listOf(seg)
      slashes <- Gen.oneOf("/", "//", "")
      trail <- Gen.oneOf("", "/")
      params <- Gen.listOf(for {
        k <- Gen.oneOf("a", "b", "utm_source", "gclid", "zz")
        v <- seg
      } yield s"$k=$v")
      frag <- Gen.oneOf("", "#x", "#sec-2")
    } yield s"$scheme://$caseHost$port$slashes${segs.mkString("/")}$trail" +
      (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag
    val urls = (0 until 300).flatMap(i => url.apply(
      Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    val once = canon(urls: _*)
    val twice = canon(once: _*)
    twice shouldBe once
    // canonical forms never carry fragments or tracking params
    once.foreach { u =>
      u should not include "#"
      u should not include "utm_"
      u should not include "gclid"
    }
  }

  test("domainBlocked: exact + subdomain suffix rule, case/port " +
    "insensitive, never a bare-suffix false positive") {
    import spark.implicits._
    val rows = Seq(
      ("https://tracker.net/x", true),        // exact
      ("https://ads.tracker.net/x", true),    // subdomain
      ("https://a.b.tracker.net/x", true),    // deep subdomain
      ("https://ADS.Tracker.NET:443/x", true),// case + default port
      ("https://nottracker.net/x", false),    // suffix-only host
      ("https://tracker.net.evil.com/x", false), // blocked name mid-host
      ("https://example.org/x", false)
    ).toDF("url", "want")
    val bad = rows.filter(
      graft.functions.UrlFunctions.domainBlocked(col("url"),
        Seq("Tracker.NET")) =!= col("want")).count()
    bad shouldBe 0L
    val kept = graft.functions.UrlFunctions.dropBlockedDomains(
      rows, "url", Seq("tracker.net")).count()
    kept shouldBe 3L
  }
}
