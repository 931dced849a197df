package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — the classic sublinear-space
  * frequency sketch (Cormode & Muthukrishnan 2005): `depth` hash rows ×
  * `width` counters; an item's estimate is the MIN of its `depth`
  * counters, always >= the true count, over by at most εN with high
  * probability (ε ≈ e/width).
  *
  * Scale shape: each sketch row is one map-side-combinable groupBy whose
  * OUTPUT is at most `width` rows — the shuffle carries counters, not
  * tokens — and the estimate joins are all broadcasts of those tiny
  * counter tables. At 100 TB the sketch build is embarrassingly parallel
  * and the merged sketch is kilobytes, which is the entire point of the
  * structure (an exact groupBy of a heavy-tailed token space shuffles
  * billions of distinct keys).
  *
  * Hashing is md5-only (the engine's one hash family — see Queries.scala
  * scaladoc) and the width is a power of 16 so a bucket is simply the
  * first `hexChars` hex characters of md5(token + "|" + row): uniform
  * (md5 bits are uniform), engine-portable as a plain string — no base
  * conversion anywhere, and the DuckDB twin is `substr(md5(...), 1, n)`
  * verbatim. */
object Sketches {

  /** Bucket of `tok` in sketch row `row`: the first `hexChars` hex chars
    * of md5 — the top 4×hexChars bits, i.e. width = 16^hexChars. */
  def cmsBucket(tok: Column, row: Int, hexChars: Int): Column =
    substring(md5(concat(tok, lit("|" + row))), 1, hexChars)

  /** One sketch row: bucket -> count. At most 16^hexChars output rows. */
  def cmsRow(toks: DataFrame, tokCol: String, row: Int,
             hexChars: Int): DataFrame =
    toks.groupBy(cmsBucket(col(tokCol), row, hexChars).as("__b"))
      .agg(count(lit(1)).as(s"__c$row"))

  /** Merge two sketch rows of the same row index and width: counters
    * add per bucket. This is the defining CMS property — the sketch of a
    * union is the elementwise sum of the shard sketches (proved in
    * SketchesSpec), so a 1000-executor build is embarrassingly-parallel
    * partial sketches plus one kilobyte-sized merge, and sketches of
    * yesterday's corpus and today's delta combine without re-reading
    * either. */
  def mergeRow(a: DataFrame, b: DataFrame, row: Int): DataFrame =
    a.unionByName(b).groupBy("__b")
      .agg(sum(col(s"__c$row")).as(s"__c$row"))

  /** Heavy hitters by CMS estimate: whitespace-tokenize `textCol`, build
    * a depth×16^hexChars sketch, estimate every distinct token, return
    * the top `k` by (estimate desc, token asc) with the true count
    * alongside (est >= true_n always; equality whenever some row has no
    * collision for the token). */
  def cmsTopK(df: DataFrame, textCol: String, depth: Int = 4,
              hexChars: Int = 3, k: Int = 20): DataFrame = {
    val toks = df.select(explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val candidates = toks.groupBy("tok").agg(count(lit(1)).as("true_n"))
    val estimated = (0 until depth).foldLeft(candidates) { (acc, i) =>
      acc.join(broadcast(cmsRow(toks, "tok", i, hexChars)),
        cmsBucket(col("tok"), i, hexChars) === col("__b")).drop("__b")
    }
    estimated
      .withColumn("est", least((0 until depth).map(i => col(s"__c$i")): _*))
      .select("tok", "est", "true_n")
      .orderBy(desc("est"), asc("tok"))
      .limit(k)
  }
}
