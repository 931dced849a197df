package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst SimHash-16 over a token-array column: bit i of the
  * signature is the majority vote, across tokens, of the low bit of hex
  * nibble i of md5(token); output is a 16-char '0'/'1' string (the
  * engine-independent form the SQL oracle can reproduce nibble-by-nibble
  * with `substr(md5(t), i, 1)`).
  *
  * Exists because the `functions`-only formulation spelled one interpreted
  * `aggregate()` HOF per bit — 16 passes over the array, each re-evaluating
  * any expression tree inlined into the lambda (HOF lambdas get no CSE and
  * sit outside whole-stage codegen; this was the r3 bench's d5 hotspot at
  * 3.4 s). Here each token is md5-digested ONCE and all 16 votes are taken
  * from that digest's leading 8 bytes in a single pass.
  *
  * Semantics match the HOF/oracle form for every non-null array: a null
  * token element votes −1 on every bit (`when(instr(null…) > 0,
  * 1).otherwise(-1)` → −1); a tie or negative vote yields '0'; an empty
  * array yields all-'0'. A null input ARRAY null-propagates here (standard
  * UnaryExpression behavior) — the HOF form and the oracle's
  * `coalesce(list_sum(…), 0)` would yield all-'0' for a null text, so the
  * column API [[graft.dedup.Dedup.simhash16]] coalesces the token array to
  * empty before this expression; use it rather than raw SimHash16 when
  * null documents are possible.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash16 requires an array<string> argument, got $t")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.compute(input.asInstanceOf[ArrayData])

  // one static call from the generated code keeps the expression inside
  // the enclosing whole-stage pipeline (no interpreted fallback)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash16 = copy(child = newChild)
}

object SimHash16 {
  /** Column API (Spark 4 ColumnNode ↔ Catalyst Expression bridge). */
  def apply(tokens: Column): Column =
    Bridge.column(new SimHash16(Bridge.expression(tokens)))

  private[graft] def build(exprs: Seq[Expression]): SimHash16 = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"simhash16 requires exactly 1 argument, got ${exprs.length}")
    SimHash16(exprs.head)
  }

  /** Register as SQL function `simhash16`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash16", build, "built-in")
}

/** Plain object (not a companion) so the method compiles to a true Java
  * static, callable by name from whole-stage-generated code. */
object SimHashImpl {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): UTF8String = {
    val votes = new Array[Int](16)
    val digest = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < 16) { votes(j) -= 1; j += 1 }
      } else {
        digest.reset()
        val d = digest.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 16) {
          val b = d(j >> 1) & 0xff
          val nibble = if ((j & 1) == 0) b >>> 4 else b & 0x0f
          votes(j) += (if ((nibble & 1) == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      out(j) = if (votes(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
