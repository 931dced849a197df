package graft.vocab

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.enrich.CaptionStats

/** Corpus vocabulary (reference `generate_corpus_vocab`, `utils.py:148-180`;
  * notebook `generate_wismir_vocab.ipynb`): all `(token, pos)` pairs of the
  * corpus with counts, sorted by count descending.
  *
  * The reference streams every caption through spaCy into a driver-side
  * `Counter` — single-machine, memory-bound at corpus scale. Here it is the
  * canonical Spark shape: `explode` → `groupBy(token,pos).count()`, which
  * Catalyst executes as partial (map-side) + final hash aggregation, so the
  * shuffle carries only distinct (token,pos) partial counts — at 100 TB the
  * shuffled volume is bounded by vocabulary size × partitions, not corpus
  * size.
  */
object Vocab {

  /** (token, pos, count) sorted by count desc, token/pos asc as a
    * deterministic tiebreak (reference sorts by count only, `utils.py:178`).
    * Tokens keep their ORIGINAL case (the reference counts spaCy
    * `tok.text`, `utils.py:163-165`) — lowercasing first would make the
    * capitalization-driven PROPN tag unreachable. */
  def generate(df: DataFrame, textCol: String): DataFrame = {
    val toks = df.select(
      explode(CaptionStats.tokens(col(textCol))).as("token"))
      .withColumn("pos", CaptionStats.posTag(col("token")))
    toks.groupBy("token", "pos").agg(count(lit(1)).as("count"))
      .orderBy(desc("count"), asc("token"), asc("pos"))
  }
}
