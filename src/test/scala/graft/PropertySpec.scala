package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.dedup.Dedup
import graft.enrich.{CaptionStats, Readability}
import graft.filters.RangeFilters
import graft.filters.RangeFilters.RangeFilter

/** Property-based invariants over generated inputs (SURVEY.md §5: the
  * reference has none; these encode the invariants it violated by hand,
  * e.g. the ratio ≤ 1 patch at ipynb:17484-17491).
  * Driven through the engine in batches (one Spark job per property,
  * not per case). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.nonEmptyListOf(
    Gen.frequency(8 -> Gen.alphaChar, 1 -> Gen.numChar,
      1 -> Gen.oneOf('ä', 'é', 'ß', 'ö'))).map(_.mkString)
  private val text: Gen[String] = for {
    words <- Gen.listOfN(20, word)
    seps <- Gen.listOfN(20, Gen.oneOf(" ", "  ", ". ", "! ", "? ", "\n"))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  private def sample(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))

  test("enrichment invariants hold on 200 generated texts") {
    val df = CaptionStats.enrich(sample(text, 200).toDF("caption"),
      "caption")
    val sz = org.apache.spark.sql.functions.size _
    val bad = df.filter(
      col("num_tok") < 0 || col("num_sent") < 0 ||
        col("min_sent_len") > col("max_sent_len") ||
        sz(col("ne_texts")) =!= col("num_ne") ||
        col("ratio_ne_tok") < 0 || col("ratio_ne_tok") > 1 ||
        col("ratio_all_noun_tok") < 0 || col("ratio_all_noun_tok") > 1 ||
        col("num_nouns") + col("num_propn") + col("num_conj") +
          col("num_verb") + col("num_sym") + col("num_num") +
          col("num_adp") + col("num_adj") =!= col("num_tok"))
    bad.count() shouldBe 0L
  }

  test("BPE invariants on generated vocabularies: segments concatenate " +
    "back to the word, never cross boundaries, and merge counts are " +
    "positive and non-increasing") {
    import graft.vocab.Bpe
    import org.apache.spark.sql.functions.{col, concat_ws}
    // space-free lowercase words with duplicates (weights force merges)
    val w = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val vocab = (0 until 60).flatMap(i => w.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong)))
      .groupBy(identity).map { case (s, xs) => (s, xs.size.toLong + 2L) }
      .toSeq
    val df = vocab.toDF("w", "n")
    val merges = Bpe.learnMerges(df, "w", "n", nMerges = 10)
    // counts positive; the best pair's count never increases as merges
    // consume pair mass (not strictly — a merge can create a new pair —
    // but never above the previous max, which was globally maximal)
    merges.foreach(_._3 should be > 0L)
    merges.sliding(2).foreach {
      case Seq(a, b) => b._3 should be <= a._3
      case _ =>
    }
    // segmentation round-trip: concatenating a word's segments yields
    // the word, for every vocab word (merges never cross boundaries)
    val back = df.select(col("w"),
      concat_ws("", Bpe.segment(col("w"), merges.map(m => (m._1, m._2))))
        .as("r"))
      .filter(col("w") =!= col("r"))
    back.count() shouldBe 0L
  }

  test("syllables ≥ 1 and ≤ word length; total = Σ per-token") {
    val words = sample(word, 300)
    val df = words.toDF("w")
    val strLen = org.apache.spark.sql.functions.length _
    df.filter(Readability.syllables(col("w")) < 1 ||
      Readability.syllables(col("w")) > strLen(col("w")))
      .count() shouldBe 0L
  }

  test("jaccard symmetric, in [0,1], 1 iff same token set") {
    val pairs = sample(text, 60).grouped(2)
      .collect { case Seq(a, b) => (a, b) }.toSeq
    val df = pairs.toDF("a", "b")
    val jab = Dedup.ngramJaccard(col("a"), col("b"), 1)
    val jba = Dedup.ngramJaccard(col("b"), col("a"), 1)
    df.filter(jab < 0 || jab > 1 || jab =!= jba).count() shouldBe 0L
    // identity: every text has jaccard 1 with itself
    val self = sample(text, 30).toDF("a")
    self.filter(org.apache.spark.sql.functions.length(trim(col("a"))) > 0 &&
      Dedup.ngramJaccard(col("a"), col("a"), 1) =!= 1.0)
      .count() shouldBe 0L
  }

  test("range filter: exclusive bounds honored for arbitrary bounds") {
    val boundsGen = for {
      a <- Gen.chooseNum(-100.0, 100.0)
      b <- Gen.chooseNum(-100.0, 100.0)
    } yield (math.min(a, b), math.max(a, b))
    val cases = (0 until 40).flatMap(i => boundsGen.apply(
      Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    // one batched job: tag each case, filter per-case bounds, check
    cases.foreach { case (lo, hi) =>
      val df = Seq(lo - 1, lo, (lo + hi) / 2, hi, hi + 1).toDF("x")
      val out = RangeFilters(df,
        Seq(RangeFilter("x", Some(lo), Some(hi))))
        .collect().map(_.getDouble(0))
      out.foreach { v => assert(v > lo && v < hi) }
    }
  }

  test("webp codec round-trips arbitrary ARGB images bit-exactly") {
    // driver-side property (no Spark): random dims + random pixels,
    // including full alpha range and degenerate 1×1
    val rng = new scala.util.Random(1312)
    (0 until 25).foreach { i =>
      val w = 1 + rng.nextInt(23)
      val h = 1 + rng.nextInt(17)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, rng.nextInt())
      val bytes = graft.images.WebpCodec.encodeLossless(img).get
      val back = graft.images.WebpCodec.decode(bytes)
      back.getWidth shouldBe w
      back.getHeight shouldBe h
      for (x <- 0 until w; y <- 0 until h)
        assert(back.getRGB(x, y) == img.getRGB(x, y),
          s"case $i pixel ($x,$y)")
    }
  }

  test("native shingles matches the HOF transform formulation") {
    // order included: both keep first-occurrence order, so whole-array
    // equality (not just set equality) must hold
    val texts = sample(text, 120) ++ Seq("", "one", "a b", "x x x x x",
      "ä é ß ä é ß", "w1 w2 w3 w1 w2 w3 w1 w2 w3")
    val df = texts.toDF("text").select(
      CaptionStats.tokens(lower(col("text"))).as("toks"))
    Seq(2, 3, 5).foreach { n =>
      val diff = df.select(
        graft.functions.Shingles(col("toks"), n).as("a"),
        Dedup.shinglesFromToksHof(col("toks"), n).as("b"))
        .filter(!(col("a") === col("b")))
      diff.count() shouldBe 0L
    }
  }

  test("sentence dedup matches a sequential reference on generated corpora") {
    // differential test: the distributed first-occurrence-wins rebuild
    // must equal a trivially-correct sequential simulation (docs in id
    // order, sentences in position order, global seen-set)
    val texts = sample(text, 80)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val orig: Seq[(Long, Seq[String])] = df
      .select(col("doc_id"),
        graft.enrich.CaptionStats.sentences(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toSeq
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val expected: Map[Long, (String, Long)] = orig.flatMap {
      case (id, sents) =>
        val ks = sents.filter(seen.add)
        if (ks.nonEmpty) Some(id -> (ks.mkString(" "), ks.length.toLong))
        else None
    }.toMap
    val got: Map[Long, (String, Long)] = graft.dedup.Dedup
      .dropRepeatedSentences(df, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    got shouldBe expected
  }

  test("quantize-mode webp contract: quality is a monotone rate knob") {
    // The STAND-IN lossy tier (webpEncodeQuantized / chain
    // mode=quantize — no longer the lossless=false default, which now
    // routes to the real VP8 encoder): quality maps to a channel
    // bit-quantization (shift = min(5, (100−q)/20)) before a
    // lossless VP8L encode. Contract, checked here:
    //  (1) error(q) is non-increasing in q — pointwise, because the
    //      quantization residue v mod 2^s1 always dominates v mod 2^s2
    //      when s2 ≤ s1 (2^s2 divides 2^s1);
    //  (2) q ≥ 81 → shift 0 → bit-identical to the lossless path;
    //  (3) per-channel error < 2^shift; alpha is never touched.
    val rng = new scala.util.Random(77)
    val (w, h) = (19, 11)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rng.nextInt())
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val orig = img.getRGB(0, 0, w, h, null, 0, w)
    def decodeAt(q: Int): Array[Int] = {
      val webp = graft.images.ImageOps.webpEncodeQuantized(png, q).get
      graft.images.WebpCodec.decode(webp).getRGB(0, 0, w, h, null, 0, w)
    }
    def stats(px: Array[Int]): (Double, Int, Boolean) = {
      var sum = 0L; var max = 0; var alphaOk = true
      px.indices.foreach { i =>
        val a = px(i); val b = orig(i)
        Seq(16, 8, 0).foreach { s =>
          val d = math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff))
          sum += d; max = math.max(max, d)
        }
        alphaOk &&= (a >>> 24) == (b >>> 24)
      }
      (sum.toDouble / (px.length * 3), max, alphaOk)
    }
    val grid = Seq(0, 15, 35, 55, 75, 95, 100)
    val shifts = grid.map(q => math.min(5, math.max(0, (100 - q) / 20)))
    val results = grid.map(q => stats(decodeAt(q)))
    results.foreach { case (_, _, alphaOk) => assert(alphaOk) }
    results.zip(shifts).foreach { case ((_, max, _), s) =>
      assert(max < (1 << s) || s == 0 && max == 0) }
    results.map(_._1).sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo >= hi, "error must not increase with quality") }
    // top bucket: bit-identical to the lossless path
    graft.images.ImageOps.webpEncodeQuantized(png, 95)
      .get shouldBe graft.images.ImageOps.webpEncode(png,
      lossless = true).get
  }

  test("minhash signature agreement is monotone-ish in jaccard") {
    // identical docs always produce identical signatures
    val t = sample(text, 20)
    val df = t.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val doubled = df.union(df.withColumn("doc_id", col("doc_id") + 1000))
    val sig = Dedup.minhashSignatures(doubled, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(r.getString)).toMap
    (0 until t.length).foreach { i =>
      sig(i.toLong) shouldBe sig(i + 1000L)
    }
  }

  test("zOrderKey round-trips: de-interleaving recovers both coordinates") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(11)
    val pts = Seq.fill(300)((rng.nextInt(1 << 12).toLong,
      rng.nextInt(1 << 12).toLong))
    val zs = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.analytics.Layout.zOrderKey(col("x"), col("y"), 12).as("z"))
      .collect()
    def deinterleave(z: Long, odd: Int): Long =
      (0 until 12).map(i => ((z >> (2 * i + odd)) & 1L) << i).sum
    zs.foreach { r =>
      deinterleave(r.getLong(2), 0) shouldBe r.getLong(0)
      deinterleave(r.getLong(2), 1) shouldBe r.getLong(1)
    }
  }

  test("editDistancePairs finds every generated single-edit typo pair") {
    val base = Gen.listOfN(10, Gen.alphaLowerChar).map(_.mkString)
    val words = sample(base, 60).distinct
    val rng = new scala.util.Random(7)
    val typos = words.map { w =>
      val i = rng.nextInt(w.length)
      rng.nextInt(3) match {
        case 0 => // substitution: guaranteed != original char
          w.updated(i, if (w(i) == 'z') 'a' else (w(i) + 1).toChar)
        case 1 => w.substring(0, i) + w.substring(i + 1) // deletion
        case _ => w.substring(0, i) + "q" + w.substring(i) // insertion
      }
    }
    val docs = words.zip(typos).zipWithIndex
      .map { case ((w, t), i) => (i.toLong, s"$w $t") }
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, "text", 4, 20)
      .collect().map(r => Set(r.getString(0), r.getString(1)))
    // exact recall: every (word, typo) pair with one real edit is found
    words.zip(typos).foreach { case (w, t) =>
      pairs should contain(Set(w, t))
    }
  }

  test("dupSpans invariants: frac in [0,1], bounded by n_spans, corpus " +
    "row order never changes the result, verbatim dup docs score 1.0") {
    val base = sample(text, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    // append a verbatim copy of doc 0 under a new id
    val corpus = base :+ (1000L, base.head._2)
    def run(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] =
      Dedup.dupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", n = 4)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3))).toMap
    val out = run(corpus)
    out.values.foreach { case (nSpans, nDup, frac) =>
      nSpans should be > 0L
      nDup should be <= nSpans
      frac should (be >= 0.0 and be <= 1.0)
      frac shouldBe nDup.toDouble / nSpans.toDouble
    }
    // the verbatim pair: every window shared → frac exactly 1.0 (if the
    // docs are long enough to have windows at all)
    for (d <- Seq(0L, 1000L); v <- out.get(d)) v._3 shouldBe 1.0
    // permutation invariance: reversing corpus order changes nothing
    run(corpus.reverse) shouldBe out
  }

  test("pagerank invariants: rank ≥ base, iteration-0 mass conserved " +
    "through out-degree splits (minus integer truncation)") {
    import graft.ml.PageRank
    val rng = new scala.util.Random(7)
    val n = 30
    val edges = (0 until n).flatMap { i =>
      (0 until 1 + rng.nextInt(3)).map(_ => (s"n$i", s"n${rng.nextInt(n)}"))
    }.distinct
    val nodes = (0 until n).map(i => s"n$i")
    val r1 = PageRank.pagerank(nodes.toDF("node"),
      edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    r1.keySet shouldBe nodes.toSet
    // every node keeps at least the damped base
    all(r1.values) should be >= 150000L
    // one-iteration mass check: Σ contributions ≤ Σ initial rank, and
    // the deficit is only integer truncation (< 1 unit per edge)
    val r1iter = PageRank.pagerank(nodes.toDF("node"),
      edges.toDF("src", "dst"), iters = 1)
      .collect().map(_.getLong(1)).sum
    val upper = n * 150000L + (85L * n * 1000000L) / 100L
    r1iter should be <= upper
    r1iter should be > upper - n * 1000L // truncation deficit is tiny
  }

  test("RepetitionCovs ≡ a naive driver-side reference on generated " +
    "token arrays: counts, char coverage, and the top-gram tie rule") {
    // tiny token alphabet → heavy duplicate grams and genuine count
    // ties (the tie-break path executes, not just the max path); BMP
    // chars only so String.length == code points == UTF8String.numChars
    val tok = Gen.oneOf("a", "b", "ab", "ba", "ä", "xy")
    val arr = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, tok))
    val samples: Seq[Seq[String]] = (0 until 150).flatMap(i =>
      arr.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)))
    def ref(toks: Seq[String]): Seq[Long] = (2 to 10).map { n =>
      if (toks.length < n) 0L
      else {
        val counts = toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
        if (n <= 4) {
          // max count, ties → lexicographically smallest gram
          val (g, c) = counts.toSeq.minBy { case (g, c) => (-c, g) }
          c * g.length.toLong
        } else counts.collect { case (g, c) if c > 1L =>
          c * g.length.toLong }.sum
      }
    }
    val df = samples.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }.toDF("id", "toks")
    val got = df.select(col("id"),
        graft.functions.RepetitionCovs(col("toks")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    samples.zipWithIndex.foreach { case (ts, i) =>
      withClue(s"sample $i (${ts.mkString("|")}): ") {
        got(i.toLong) shouldBe ref(ts)
      }
    }
  }

  test("KMV sketch invariants on generated corpora: sketch(A∪B∪C) = " +
    "merge in any association; estimator = exact count below k") {
    import graft.analytics.Sketches
    val itemGen = Gen.listOfN(60,
      Gen.chooseNum(0, 400).map(i => s"item$i"))
    val corpora = (0 until 6).map(i =>
      itemGen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).get)
    def sk(items: Seq[String]*) = Sketches.kmvSketch(
      items.flatten.map(("s", _)).toDF("source", "sh"),
      "source", "sh", k = 24)
    def hashes(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(1)).sorted.toSeq
    corpora.grouped(3).foreach { case Seq(a, b, c) =>
      val whole = hashes(sk(a, b, c))
      // left- and right-associated merges both equal the direct sketch
      hashes(Sketches.kmvMerge(
        Sketches.kmvMerge(sk(a), sk(b), 24), sk(c), 24)) shouldBe whole
      hashes(Sketches.kmvMerge(
        sk(a), Sketches.kmvMerge(sk(b), sk(c), 24), 24)) shouldBe whole
      // distinct-below-k sets are counted exactly (partial sketch = set)
      val small = a.distinct.take(10)
      val skSmall = sk(small)
      skSmall.count() shouldBe small.size.toLong
    }
  }
}
