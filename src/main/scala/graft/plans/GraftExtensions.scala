package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.SyllableCount

/** Optimizer rule: rewrite the `functions`-only syllable formulation
  *
  *   greatest(size(regexp_extract_all(lower(w), '[aeiouy]+', 0)), 1)
  *
  * into the native codegen'd [[SyllableCount]] expression (same semantics,
  * property-tested; ~5× cheaper — no lowercase copy, no match-list
  * allocation). This lets SQL users and config-driven plans write the
  * portable regexp form and still get the native operator — the classic
  * "logical pattern → efficient physical expression" Catalyst move.
  */
object RewriteSyllableRegex extends Rule[LogicalPlan] {

  private object SyllablePattern {
    def unapply(e: Expression): Option[Expression] = e match {
      case Greatest(Seq(
        Size(RegExpExtractAll(Lower(word),
          Literal(pat, _), Literal(idx, _)), _),
        Literal(one, IntegerType)))
        if pat != null && pat.toString == "[aeiouy]+" &&
          idx == 0 && one == 1 =>
        Some(word)
      case Greatest(Seq(
        Literal(one, IntegerType),
        Size(RegExpExtractAll(Lower(word),
          Literal(pat, _), Literal(idx, _)), _)))
        if pat != null && pat.toString == "[aeiouy]+" &&
          idx == 0 && one == 1 =>
        Some(word)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // coalesce(…, 1) preserves NULL semantics: `greatest` SKIPS null
      // inputs (NULL word → greatest(NULL, 1) = 1) while the
      // null-intolerant SyllableCount returns NULL — the rewrite must not
      // change results for nullable columns
      case SyllablePattern(word) =>
        Coalesce(Seq(SyllableCount(word), Literal(1)))
    }
}

/** Session extensions: `syllable_count` SQL function + the rewrite rule.
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("syllable_count"),
      new ExpressionInfo(classOf[SyllableCount].getName, "syllable_count"),
      (exprs: Seq[Expression]) => SyllableCount.build(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => graft.functions.DotProduct.build(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash16"),
      new ExpressionInfo(
        classOf[graft.functions.SimHash16].getName, "simhash16"),
      (exprs: Seq[Expression]) => graft.functions.SimHash16.build(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_rot"),
      new ExpressionInfo(
        classOf[graft.functions.MinHashRot].getName, "minhash_rot"),
      (exprs: Seq[Expression]) => graft.functions.MinHashRot.build(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("shingles"),
      new ExpressionInfo(
        classOf[graft.functions.Shingles].getName, "shingles"),
      (exprs: Seq[Expression]) => graft.functions.Shingles.build(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sentence_dup_stats"),
      new ExpressionInfo(
        classOf[graft.functions.SentenceDupStats].getName,
        "sentence_dup_stats"),
      (exprs: Seq[Expression]) =>
        graft.functions.SentenceDupStats.build(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("repetition_covs"),
      new ExpressionInfo(
        classOf[graft.functions.RepetitionCovs].getName, "repetition_covs"),
      (exprs: Seq[Expression]) => graft.functions.RepetitionCovs.build(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => graft.functions.NfcNormalize.build(exprs)))
    e.injectOptimizerRule(_ => RewriteSyllableRegex)
    // whole-operator tier: plans the custom AsOfJoinPlan logical node
    // into MergeAsOfJoinExec (NativeAsOf.asofJoin also self-registers on
    // its session via experimental.extraStrategies, so the operator
    // works without extensions; this makes it first-class when they ARE
    // installed)
    e.injectPlannerStrategy(_ => NativeAsOfStrategy)
  }
}
