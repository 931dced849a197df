package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's syllable heuristic: the
  * number of maximal `[aeiouy]+` runs in the lowercased word, minimum 1
  * (documented engine semantics, SURVEY.md §7.4; powers the readability
  * scores, reference `utils.py:258-263`).
  *
  * Exists because the `functions`-only formulation —
  * `greatest(size(regexp_extract_all(lower(w), "[aeiouy]+")), 1)` —
  * allocates a lowercased copy plus a match list per word. This expression
  * is a single byte scan, codegen'd into the enclosing whole-stage loop:
  * ASCII vowels are case-folded with `| 0x20`, and multi-byte UTF-8 units
  * (≥ 0x80) can never alias an ASCII vowel byte, so scanning bytes is
  * exact for any Unicode input.
  */
case class SyllableCount(child: Expression) extends UnaryExpression {

  // analyzer-time type check (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"syllable_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "syllable_count"

  @inline private def isVowel(b: Byte): Boolean = {
    val c = (b | 0x20).toChar
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var runs = 0
    var inRun = false
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) >= 0 && isVowel(bytes(i))
      if (v && !inRun) runs += 1
      inRun = v
      i += 1
    }
    if (runs == 0) 1 else runs
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val runs = ctx.freshName("runs")
      val inRun = ctx.freshName("inRun")
      val i = ctx.freshName("i")
      val ch = ctx.freshName("ch")
      val isV = ctx.freshName("isV")
      s"""
        byte[] $bytes = $c.getBytes();
        int $runs = 0;
        boolean $inRun = false;
        for (int $i = 0; $i < $bytes.length; $i++) {
          int $ch = ($bytes[$i] | 0x20);
          boolean $isV = $bytes[$i] >= 0 && ($ch == 'a' || $ch == 'e' ||
            $ch == 'i' || $ch == 'o' || $ch == 'u' || $ch == 'y');
          if ($isV && !$inRun) $runs++;
          $inRun = $isV;
        }
        ${ev.value} = $runs == 0 ? 1 : $runs;
      """
    })

  override protected def withNewChildInternal(
      newChild: Expression): SyllableCount = copy(child = newChild)
}

object SyllableCount {
  /** Column API (Spark 4 ColumnNode ↔ Catalyst Expression bridge). */
  def apply(c: Column): Column =
    Bridge.column(new SyllableCount(Bridge.expression(c)))

  private[graft] def build(exprs: Seq[Expression]): SyllableCount = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"syllable_count requires exactly 1 argument, got ${exprs.length}")
    SyllableCount(exprs.head)
  }

  /** Register as SQL function `syllable_count`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "syllable_count", build, "built-in")
}
