package graft.vocab

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UNIGRAM-LM tokenizer training and segmentation (Kudo 2018,
  * "Subword Regularization", §3 — the SentencePiece default and the
  * second of the two production tokenizer families; [[Bpe]] is the
  * other). Where BPE GROWS a vocabulary bottom-up by merging, unigram
  * SHRINKS one top-down: seed with every frequent substring, segment
  * every word by minimum-cost Viterbi under the current piece
  * distribution, recount piece usage, prune, repeat.
  *
  * Engine adaptations, both deliberate:
  *  - Costs are INTEGER BITS — cost(p) = bitlen(N) − bitlen(cnt_p),
  *    the t11/m17 code-length idiom: monotone in −log₂ p, within one
  *    bit of it, and exactly reproducible (no libm, no float sums).
  *    OOV single chars floor at cnt=1 (max representable cost), the
  *    m16 convention.
  *  - The E-step is VITERBI-EM with hard counts (each word's best
  *    segmentation counts fully) instead of full forward-backward
  *    expectations: hard counts keep every statistic an integer and
  *    every round a stateless aggregate. SentencePiece itself offers
  *    this as `--hard_em`; the soft variant is a float-expectation
  *    swap, not a structural change.
  *
  * Scale shape (the [[Bpe]] argument verbatim): training never touches
  * corpus rows — it runs on the (word, count) HISTOGRAM, so seeding is
  * one substring-explode aggregate over vocabulary-sized data, and
  * each EM round is one broadcast-vocab segmentation map + one
  * map-combined usage count. The per-round driver state is the piece
  * table itself (≤ seedSize rows — the bounded centroid-collect
  * class, kilobytes to low megabytes; the corpus never collects).
  * Segmentation of actual corpora goes through [[segmentWords]] — the
  * broadcast scalar path, priced on the vocabulary exactly like
  * `Bpe.segmentWords`. */
object UnigramLm {

  /** Integer-bits piece cost: bitlen(total) − bitlen(cnt). */
  def costBits(cnt: Long, total: Long): Long =
    (64 - java.lang.Long.numberOfLeadingZeros(total)) -
      (64 - java.lang.Long.numberOfLeadingZeros(math.max(cnt, 1L)))

  /** A trained (or seeded) piece table: counts + the derived total.
    * Unknown single chars cost bitlen(total) — one past the
    * costBits(1) = bitlen(total) − 1 maximum any in-vocab piece can
    * reach, the OOV floor. */
  final case class PieceTable(counts: Map[String, Long]) {
    val total: Long = math.max(counts.valuesIterator.sum, 1L)
    private val oovCost = costBits(1L, total) + 1L
    def cost(p: String): Option[Long] =
      counts.get(p).map(costBits(_, total))
        .orElse(if (p.length == 1) Some(oovCost) else None)
  }

  /** Minimum-cost Viterbi segmentation of one word. DP over end
    * positions; candidate pieces are the ≤ `maxPieceLen` suffixes of
    * each prefix that are in the table (single chars always viable
    * via the OOV floor, so every word segments). Deterministic
    * tie-break, in order: lower total cost, then FEWER pieces, then
    * the longer final piece (smaller split point) — a fixed total
    * order so re-runs and engines agree. */
  def segment(word: String, table: PieceTable, maxPieceLen: Int)
      : Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val inf = Long.MaxValue / 4
    val cost = Array.fill(n + 1)(inf)
    val nPieces = Array.fill(n + 1)(Int.MaxValue)
    val prev = Array.fill(n + 1)(Int.MaxValue)
    cost(0) = 0L; nPieces(0) = 0; prev(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (cost(j) < inf) {
          table.cost(word.substring(j, i)).foreach { c =>
            val cand = cost(j) + c
            val candN = nPieces(j) + 1
            val better = cand < cost(i) ||
              (cand == cost(i) && (candN < nPieces(i) ||
                (candN == nPieces(i) && j < prev(i))))
            if (better) { cost(i) = cand; nPieces(i) = candN; prev(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var end = n
    while (end > 0) { val s = prev(end); rev += ((s, end)); end = s }
    rev.reverseIterator.foreach { case (s, e) => out += word.substring(s, e) }
    out.result()
  }

  /** Weighted substring seed counts over the word histogram: every
    * substring of length ≤ `maxPieceLen`, counted occurrence-weighted
    * (one explode + one map-combined aggregate over vocabulary-sized
    * data), capped to the top `seedSize` by (count desc, piece asc)
    * with every single character retained regardless of rank — the
    * segmentability floor. */
  def seedCounts(words: DataFrame, wordCol: String, countCol: String,
                 maxPieceLen: Int, seedSize: Int): Seq[(String, Long)] = {
    val subs = words.select(col(wordCol).as("w"),
        col(countCol).cast("long").as("n"))
      .select(explode(expr(
        s"""flatten(transform(sequence(1, length(w)), i ->
           transform(sequence(1, least($maxPieceLen, length(w) - i + 1)),
             l -> substring(w, i, l))))""")).as("piece"), col("n"))
      .groupBy("piece").agg(sum("n").as("cnt"))
    // cap SERVER-SIDE: the multi-char top-seedSize is a
    // TakeOrderedAndProject, and the single-char floor is alphabet-
    // bounded — the driver never sees the substring universe (which is
    // histogram × maxPieceLen rows at web scale)
    val chars = subs.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(math.max(0, seedSize - chars.length))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    chars ++ multi
  }

  /** Viterbi-EM training: seed, then `iters` rounds of
    * (segment histogram under current costs → weighted usage counts →
    * prune to `vocabSize` by (usage desc, piece asc), single chars
    * always retained). Returns the final piece table. Each round is
    * one broadcast-vocab segmentation over the histogram plus one
    * map-combined count — the BPE round shape with a vocabulary-sized
    * (not 1-row) driver collect, documented bounded. */
  def train(words: DataFrame, wordCol: String, countCol: String,
            vocabSize: Int, iters: Int, maxPieceLen: Int = 4,
            seedSize: Int = 8192): PieceTable = {
    require(iters >= 1, "iters must be >= 1")
    val spark = words.sparkSession
    var table = PieceTable(
      seedCounts(words, wordCol, countCol, maxPieceLen, seedSize).toMap)
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(table)
      val seg = udf((w: String) =>
        if (w == null) null else segment(w, bc.value, maxPieceLen))
      val usage = words.select(col(wordCol).as("w"),
          col(countCol).cast("long").as("n"))
        .select(explode(seg(col("w"))).as("piece"), col("n"))
        .groupBy("piece").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("piece").asc)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val (chars, multi) = usage.partition(_._1.length == 1)
      // retain seed chars even if unused this round (OOV floor base)
      val keptChars = (chars ++ table.counts.keys.filter(_.length == 1)
        .filterNot(c => chars.exists(_._1 == c)).map(_ -> 1L)).toMap
      val kept = keptChars ++
        multi.take(math.max(0, vocabSize - keptChars.size))
      table = PieceTable(kept)
      bc.destroy()
    }
    table
  }

  /** Segment a word column with a trained table: the rules ship once
    * per executor as a broadcast, scalar Viterbi per row — priced on
    * the vocabulary like `Bpe.segmentWords`. Returns `df` +
    * `outCol: array<string>`. */
  def segmentWords(df: DataFrame, wordCol: String, outCol: String,
                   table: PieceTable, maxPieceLen: Int = 4): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(table)
    val seg = udf((w: String) =>
      if (w == null) null else segment(w, bc.value, maxPieceLen))
    df.withColumn(outCol, seg(col(wordCol)))
  }
}
