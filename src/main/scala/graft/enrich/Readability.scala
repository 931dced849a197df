package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Readability scores (reference `utils.py:258-263` via spacy-readability;
  * formulas reproduced in `notebooks/f30k_vs_coco_vs_wicsmmir_v2.ipynb:
  * 17669-17679`) as native Catalyst expressions — pure arithmetic over
  * token/sentence/syllable counts, fully codegen'd.
  *
  * Syllable heuristic (documented engine semantics): number of maximal vowel
  * runs `[aeiouy]+` in the lowercased word, minimum 1. "Difficult word"
  * proxy for Dale–Chall: ≥ 3 syllables.
  */
object Readability {

  /** Syllable count of one word. */
  def syllables(w: Column): Column =
    greatest(size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))),
      lit(1))

  /** Total syllables over all tokens of a text column. */
  def totalSyllables(c: Column): Column =
    aggregate(CaptionStats.tokens(c), lit(0), (acc, w) => acc + syllables(w))

  private def words(c: Column): Column =
    greatest(size(CaptionStats.tokens(c)), lit(1)).cast(DoubleType)

  private def sents(c: Column): Column =
    greatest(size(CaptionStats.sentences(c)), lit(1)).cast(DoubleType)

  /** Flesch Reading Ease = 206.835 − 1.015·(W/S) − 84.6·(Syl/W).
    * No rounding: the formula is a fixed left-assoc chain of IEEE ops over
    * exact integer-valued inputs, so results are bit-stable across engines
    * (SURVEY.md §7.4 determinism note). */
  def fleschReadingEase(c: Column): Column =
    lit(206.835) - lit(1.015) * (words(c) / sents(c)) -
      lit(84.6) * (totalSyllables(c).cast(DoubleType) / words(c))

  /** Flesch–Kincaid Grade Level = 0.39·(W/S) + 11.8·(Syl/W) − 15.59. */
  def fleschKincaidGrade(c: Column): Column =
    lit(0.39) * (words(c) / sents(c)) +
      lit(11.8) * (totalSyllables(c).cast(DoubleType) / words(c)) -
      lit(15.59)

  /** Count of difficult words (≥3 syllables). */
  def difficultWords(c: Column): Column =
    size(filter(CaptionStats.tokens(c), w => syllables(w) >= 3))

  /** Dale–Chall = 0.1579·pctDifficult + 0.0496·(W/S), +3.6365 if
    * pctDifficult > 5. */
  def daleChall(c: Column): Column = {
    val pct = lit(100.0) * (difficultWords(c).cast(DoubleType) / words(c))
    lit(0.1579) * pct + lit(0.0496) * (words(c) / sents(c)) +
      when(pct > 5, lit(3.6365)).otherwise(lit(0.0))
  }
}
