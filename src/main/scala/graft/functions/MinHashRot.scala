package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a shingle-array column: element i of the
  * result is min over shingles of rotate(md5(shingle), i) — the same
  * single-digest rotation family the SQL oracle spells with
  * `min(substr(d, i+1, 32-i) || substr(d, 1, i))`.
  *
  * Exists to make signature computation MAP-ONLY. The `functions`-only
  * formulation had to `explode` the shingles and `groupBy(doc)` to take
  * the k mins — a full shuffle of every (doc, shingle-digest) row, the
  * residual cost of d3 after the single-digest family landed (r5: 7.7 s of
  * a 42 s bench). Here each row's signature is one pass over its shingle
  * array: one md5 per shingle, then k lazy rotated comparisons against the
  * running mins (a rotation is compared char-by-char with early exit and
  * only materialized on a new min). No shuffle, no aggregation buffers;
  * LSH banding downstream keeps its one groupBy as the sole exchange.
  *
  * Parity with the aggregate/oracle form: hex digests are ASCII (< 0x80),
  * so signed byte comparison == UTF8String's unsigned lexicographic
  * order == DuckDB's default VARCHAR collation on the same strings. Null
  * shingle elements are skipped (SQL `min` ignores nulls). An empty (or
  * all-null) shingle array yields an EMPTY result array, where the
  * aggregate form emitted no row at all — callers filter
  * `size(shingles) > 0` first (Dedup.signaturesFrom does), matching the
  * oracle's `unnest` dropping empty lists. */
case class MinHashRot(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k >= 1 && k <= 32 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"minhash_rot supports 1..32 hash functions, got $k")
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_rot requires an array<string> argument, got $t")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_rot"

  override def nullSafeEval(input: Any): Any =
    MinHashRotImpl.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashRotImpl.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashRot = copy(child = newChild)
}

object MinHashRot {
  /** Column API (Spark 4 ColumnNode ↔ Catalyst Expression bridge). */
  def apply(shingles: Column, k: Int): Column =
    Bridge.column(new MinHashRot(Bridge.expression(shingles), k))

  /** SQL builder: `minhash_rot(shingles, k)` with a literal int k. */
  private[graft] def build(exprs: Seq[Expression]): MinHashRot =
    exprs match {
      case Seq(arr, org.apache.spark.sql.catalyst.expressions.Literal(
        k: Int, org.apache.spark.sql.types.IntegerType)) =>
        MinHashRot(arr, k)
      case _ => throw new IllegalArgumentException(
        "minhash_rot requires (array<string>, literal int k)")
    }
}

/** Plain object (not a companion) so the method compiles to a true Java
  * static, callable by name from whole-stage-generated code. */
object MinHashRotImpl {
  private val HexChars = "0123456789abcdef".getBytes("US-ASCII")
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def rotCopy(hex: Array[Byte], i: Int): Array[Byte] = {
    val out = new Array[Byte](32)
    var j = 0
    while (j < 32) { out(j) = hex((i + j) & 31); j += 1 }
    out
  }

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val digest = md5.get()
    val mins = new Array[Array[Byte]](k)
    val hex = new Array[Byte](32)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        digest.reset()
        val d = digest.digest(arr.getUTF8String(t).getBytes)
        var j = 0
        while (j < 16) {
          hex(2 * j) = HexChars((d(j) >>> 4) & 0xf)
          hex(2 * j + 1) = HexChars(d(j) & 0xf)
          j += 1
        }
        var i = 0
        while (i < k) {
          val m = mins(i)
          if (m == null) mins(i) = rotCopy(hex, i)
          else {
            var c = 0
            var cmp = 0
            while (c < 32 && cmp == 0) {
              cmp = (hex((i + c) & 31) & 0xff) - (m(c) & 0xff)
              c += 1
            }
            if (cmp < 0) mins(i) = rotCopy(hex, i)
          }
          i += 1
        }
      }
      t += 1
    }
    if (mins(0) == null) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](k)
      var i = 0
      while (i < k) { out(i) = UTF8String.fromBytes(mins(i)); i += 1 }
      new GenericArrayData(out)
    }
  }
}
