package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization.
  *
  * Why the engine needs it: every hash-keyed dedup operator in this repo
  * (exact d1, URL d10, span d13, sentence d9, decontamination d8) keys on
  * byte-level digests, and canonically-equivalent Unicode strings can
  * have different bytes — "é" is one codepoint (U+00E9) precomposed but
  * two (e + U+0301) decomposed, and real crawl corpora mix both freely
  * (the reference's polyglot path scrubs `\p{C}` for the same class of
  * reason, `utils.py:431`). Without NFC-first, such pairs silently
  * escape every hash-based dedup — which is why the d1/d8/d9/d13 keying
  * (and the streaming dedup twin) routes through this expression by
  * default (`nfc = true` parameters in [[graft.dedup.Dedup]] /
  * [[graft.text.TextAnalysis.fingerprint]]). Spark has no built-in normalizer, so
  * this is a genuine §2.12-style extension: a single codegen'd
  * expression (no UDF serialization boundary) wrapping
  * `java.text.Normalizer`.
  *
  * Performance contract: an ASCII byte-scan fast path returns the input
  * UTF8String untouched (no String round-trip, no allocation) — on
  * mostly-ASCII corpora the normalizer costs one branch per byte; only
  * rows with multi-byte sequences pay the `isNormalized`/`normalize`
  * path, and already-NFC strings skip the rebuild. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize; ASCII inputs are returned as-is without conversion
    * (NFC is the identity on ASCII). Called from generated code via the
    * companion's static forwarder. */
  def nfc(s: UTF8String): UTF8String = {
    val b = s.getBytes
    var i = 0
    while (i < b.length && b(i) >= 0) i += 1
    if (i == b.length) s // pure ASCII: NFC identity, zero-copy
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  /** Column API (Spark 4 ColumnNode ↔ Catalyst Expression bridge). */
  def apply(c: Column): Column =
    Bridge.column(new NfcNormalize(Bridge.expression(c)))

  private[graft] def build(exprs: Seq[Expression]): NfcNormalize = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"nfc_normalize requires exactly 1 argument, got ${exprs.length}")
    NfcNormalize(exprs.head)
  }
}
