package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's NLP-backend selector surfaced as a first-class engine
  * concept: `MetadataGeneratorBackend` (`utils.py:39-43`) is a per-run
  * config choice (`configs/config_localhost_test_spacy.yml:15`,
  * `wikicaps_etl_pipeline.py:29`) selecting which library tokenizes the
  * captions — spaCy (`utils.py:228`), NLTK (`utils.py:302`) or polyglot
  * (`utils.py:397`) — producing three metadata variants per dataset.
  *
  * The engine keeps the reference's architecture (one enrichment block,
  * backend-parameterized tokenization) but replaces each library with a
  * **documented deterministic proxy** (the same license SURVEY.md §7.4
  * applies to the single-backend case). What genuinely differs between
  * the reference backends is the token stream — spaCy and NLTK emit
  * punctuation as standalone tokens, polyglot's unicode word tokenizer
  * drops it — so the proxies differ exactly there, and every downstream
  * stat (counts, NE/POS proxies, readability) inherits the choice:
  *
  *  - [[MetadataBackend.Spacy]]    token = maximal non-whitespace run
  *    (the engine's original semantics; the oracle-checked default)
  *  - [[MetadataBackend.Nltk]]     word_tokenize-like: word runs kept
  *    whole, each other non-space char its own token ("a, b!" → 4 toks)
  *  - [[MetadataBackend.Polyglot]] unicode words only: maximal
  *    letter/digit runs, punctuation dropped ("a, b!" → 2 toks)
  *
  * All three are pure codegen'd column expressions — the backend choice
  * changes the regex, never the plan shape, so switching backends costs
  * nothing at any scale. */
sealed abstract class MetadataBackend(val name: String) {
  /** Tokens of `c` under this backend's tokenizer. */
  def tokens(c: Column): Column
}

object MetadataBackend {

  case object Spacy extends MetadataBackend("spacy") {
    // delegates to THE engine token definition (CaptionStats.tokens,
    // mirrored by the DuckDB oracle's toksSql) rather than restating it —
    // the three places that tokenize must never drift apart
    def tokens(c: Column): Column = CaptionStats.tokens(c)
  }

  case object Nltk extends MetadataBackend("nltk") {
    def tokens(c: Column): Column =
      regexp_extract_all(c,
        lit("[A-Za-z0-9_']+|[^A-Za-z0-9_'\\s]"), lit(0))
  }

  case object Polyglot extends MetadataBackend("polyglot") {
    def tokens(c: Column): Column =
      regexp_extract_all(c, lit("[\\p{L}\\p{N}]+"), lit(0))
  }

  val All: Seq[MetadataBackend] = Seq(Spacy, Nltk, Polyglot)

  /** Resolve a config value (`metadata_generator_backend:`). Unknown
    * names FAIL the run — the reference errors on an unknown enum value
    * too; silently defaulting would produce mislabeled metadata. */
  def fromName(s: String): MetadataBackend =
    All.find(_.name == s.trim.toLowerCase).getOrElse(
      throw new IllegalArgumentException(
        s"unknown metadata_generator_backend '$s' " +
          s"(expected one of ${All.map(_.name).mkString(", ")})"))
}
