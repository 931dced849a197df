package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingler over a token-array column: element
  * i of the input window `[i, i+n)` joined with single spaces, first
  * occurrence kept, order of first occurrence preserved — exactly the
  * `array_distinct(transform(sequence(0, size-n), i -> concat_ws(' ',
  * slice(toks, i+1, n))))` column formulation (kept as the parity witness
  * in `Dedup.shinglesFromToksHof`) and the oracle's
  * `list_distinct(list_transform(range(...), i -> toks[i] || ' ' || ...))`.
  *
  * Why native, beyond constant factors (one pass, hash-set distinct vs the
  * HOF's O(k²) `array_distinct`): lambda-HOF formulations are a hazard
  * under Catalyst rewrites — any filter or inferred predicate that ends up
  * referencing the array gets the producing expression substituted in on
  * pushdown, and expressions inlined INTO lambda scope re-evaluate per
  * element (the r6 d3/d8 findings: +2.4 s and 17× respectively). A single
  * opaque expression has no lambda scope to poison: wherever the optimizer
  * copies it, it evaluates once per row.
  *
  * Null tokens are skipped by the window join exactly like SQL
  * `concat_ws` (they never occur from the tokenizer; defensive parity).
  * Fewer than n tokens → empty array, matching the witness's
  * `when(size < n, array())` arm. */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"shingles requires n >= 1, got $n")
      case t => TypeCheckResult.TypeCheckFailure(
        s"shingles requires an array<string> argument, got $t")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any =
    ShinglesImpl.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShinglesImpl.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): Shingles = copy(child = newChild)
}

object Shingles {
  /** Column API (Spark 4 ColumnNode ↔ Catalyst Expression bridge). */
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(new Shingles(Bridge.expression(tokens), n))

  /** SQL builder: `shingles(tokens, n)` with a literal int n. */
  private[graft] def build(exprs: Seq[Expression]): Shingles =
    exprs match {
      case Seq(arr, org.apache.spark.sql.catalyst.expressions.Literal(
        n: Int, org.apache.spark.sql.types.IntegerType)) =>
        Shingles(arr, n)
      case _ => throw new IllegalArgumentException(
        "shingles requires (array<string>, literal int n)")
    }
}

/** Plain object (not a companion) so the method compiles to a true Java
  * static, callable by name from whole-stage-generated code. */
object ShinglesImpl {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        window(j) = if (arr.isNullAt(i + j)) null
                    else arr.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls — same contract as the SQL formulation
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
