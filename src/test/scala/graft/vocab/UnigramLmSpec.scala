package graft.vocab

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._
  import UnigramLm._

  test("Viterbi picks the frequent multi-char piece over char-by-char " +
    "(the Kudo objective on a hand fixture)") {
    // "low" dominates the distribution: cost("low") << 3 × cost(char)
    val t = PieceTable(Map("low" -> 100L, "l" -> 2L, "o" -> 2L,
      "w" -> 2L, "lo" -> 2L, "ow" -> 2L))
    segment("lowlow", t, maxPieceLen = 3) shouldBe Seq("low", "low")
    segment("low", t, maxPieceLen = 3) shouldBe Seq("low")
  }

  test("every word segments (OOV chars floor) and pieces concatenate " +
    "back to the word on generated inputs") {
    val t = PieceTable(Map("th" -> 50L, "the" -> 40L, "a" -> 30L,
      "e" -> 20L))
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    (0 until 200).foreach { i =>
      val w = word.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).get.take(24)
      val segs = segment(w, t, maxPieceLen = 4)
      segs.mkString shouldBe w
      all(segs.map(_.length)) should be <= 4
    }
  }

  test("Viterbi total cost is MINIMAL: equals brute-force enumeration " +
    "on every short word") {
    val t = PieceTable(Map("ab" -> 9L, "ba" -> 7L, "abc" -> 3L,
      "a" -> 5L, "b" -> 4L, "c" -> 2L))
    def costOf(segs: Seq[String]): Long =
      segs.map(p => t.cost(p).get).sum
    def enumerate(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(3, w.length)).flatMap { l =>
        val (h, rest) = w.splitAt(l)
        if (t.cost(h).isEmpty) Seq.empty
        else enumerate(rest).map(h +: _)
      }
    val word = Gen.listOfN(7, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    (0 until 100).foreach { i =>
      val w = word.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).get
      val got = segment(w, t, maxPieceLen = 3)
      costOf(got) shouldBe enumerate(w).map(costOf).min
    }
  }

  test("training on the corpus histogram: frequent subwords survive " +
    "pruning, vocab is bounded, every word still segments") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val hist = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val table = train(hist, "w", "n", vocabSize = 400, iters = 2,
      maxPieceLen = 4, seedSize = 2048)
    val chars = table.counts.keys.count(_.length == 1)
    table.counts.size should be <= (400 + chars)
    // the corpus' most frequent word should be coverable in few pieces
    val topWord = hist.orderBy(col("n").desc).first().getString(0)
    val segs = segment(topWord, table, 4)
    segs.mkString shouldBe topWord
    segs.length should be < topWord.length // better than char-by-char
    // every histogram word round-trips
    val words = hist.select("w").collect().map(_.getString(0))
    words.foreach { w =>
      segment(w, table, 4).mkString shouldBe w
    }
  }

  test("segmentWords (broadcast scalar path) equals the driver-side " +
    "segmenter on every word") {
    val t = PieceTable(Map("lo" -> 9L, "w" -> 5L, "l" -> 3L, "o" -> 3L))
    val df = Seq("low", "lolo", "wool").toDF("w")
    val got = segmentWords(df, "w", "segs", t, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    got.foreach { case (w, segs) =>
      segs shouldBe segment(w, t, 2)
    }
  }
}
