package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the standard first pass
  * before any content-level dedup: most crawl duplicates are the SAME
  * page under cosmetically different URLs (case-shifted hosts, default
  * ports, tracking params, fragments, trailing slashes). Canonicalize,
  * then exact-dedup on the canonical string (one hash-groupBy — see
  * Dedup.scala) — at 100 TB this removes the bulk of duplicates for the
  * cost of a map-only string pass, BEFORE the expensive MinHash/LSH
  * machinery runs on what remains.
  *
  * Every step is a codegen'd built-in column expression (regexp over a
  * URL-shaped string, list ops over the query params), so the whole
  * canonicalizer fuses into the scan: no UDF, no shuffle, and the exact
  * same transforms are expressible verbatim in any SQL engine (the
  * oracle twin in Queries.scala d10). Deliberately NOT a full RFC 3986
  * resolver (no dot-segment or percent-encoding normalization — those
  * need a stateful parser); the implemented subset is the
  * crawl-pipeline canon. */
object UrlFunctions {

  /** Tracking params dropped by [[canonicalizeUrl]]: the utm_* family
    * plus the common click ids — with or without a value (`?fbclid` and
    * `?fbclid=x` are both tracking noise; requiring the `=` would let
    * the bare form block a dedup). */
  val TrackingParamPattern = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  /** Scheme (lowercased): `https://X...` → `https`. */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z]+)://", 1))

  /** Host[:port] (lowercased), with the scheme's default port stripped
    * (`:80` for http, `:443` for https). */
  def urlHost(u: Column): Column = {
    val hp = lower(regexp_extract(u, "^[A-Za-z]+://([^/?#]*)", 1))
    when(urlScheme(u) === "http", regexp_replace(hp, ":80$", ""))
      .when(urlScheme(u) === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** Path with duplicate slashes collapsed and the trailing slash
    * trimmed; an empty path canonicalizes to `/`. */
  def urlPath(u: Column): Column = {
    val p = regexp_extract(u, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val collapsed = regexp_replace(p, "/{2,}", "/")
    val trimmed = regexp_replace(collapsed, "/$", "")
    when(trimmed === "", lit("/")).otherwise(trimmed)
  }

  /** Query string canonicalized: tracking params dropped, the rest
    * sorted bytewise, re-joined with `&`; empty after filtering → ``
    * (no `?`). The fragment never participates (it is client-side). */
  def urlQuery(u: Column): Column = {
    // `^[^#?]*\?` pins the FIRST '?' that appears before any '#'
    // (RFC 3986: the query starts at the first '?'). Two distinct
    // failure modes bracket this regex: `^[^#]*\?` greedily anchors at
    // the LAST pre-fragment '?' ('/p?a=1?b=2' would drop 'a=1' and
    // collide with '/p?b=2'), while matching the first '?' anywhere
    // would leak a fragment-internal '?' ('/p#sec?x=1') into the query.
    val q = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val kept = filter(split(q, "&"), p =>
      length(p) > 0 && !p.rlike(TrackingParamPattern))
    when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(sort_array(kept), "&")))
  }

  /** The canonical form: `scheme://host path query` with each component
    * normalized as above, fragment dropped. Rows that don't look like a
    * URL (no `scheme://`) come back with empty scheme/host — callers
    * should pre-filter on [[urlScheme]] =!= "" if the column is dirty. */
  def canonicalizeUrl(u: Column): Column =
    concat(urlScheme(u), lit("://"), urlHost(u), urlPath(u), urlQuery(u))

  /** True iff the URL's host is one of `domains` or a SUBDOMAIN of one
    * (host == d, or host ends with "." + d) — the registrable-suffix
    * rule every crawl blocklist uses: blocking `tracker.net` must catch
    * `ads.tracker.net` but NOT `nottracker.net`. Hosts compare
    * lowercased with default ports stripped ([[urlHost]]); matching is
    * a fixed fold over the literal list — map-only, fuses into the
    * scan. Blocklists of thousands of entries are literal-comfortable;
    * beyond ~10⁵ switch to a broadcast join on a reversed-host prefix. */
  def domainBlocked(u: Column, domains: Seq[String]): Column = {
    require(domains.nonEmpty, "blocklist must be non-empty")
    val host = urlHost(u)
    domains.map { d0 =>
      val d = d0.toLowerCase
      host === d || host.endsWith("." + d)
    }.reduce(_ || _)
  }

  /** Keep only rows whose `urlCol` host is NOT on the domain blocklist
    * — the URL-level hygiene pass that runs before any content-level
    * filter (cheapest first). Map-only; composes onto a stream. */
  def dropBlockedDomains(df: org.apache.spark.sql.DataFrame,
                         urlCol: String,
                         domains: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(!domainBlocked(col(urlCol), domains))
}
