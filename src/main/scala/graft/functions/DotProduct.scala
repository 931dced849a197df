package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product of two float/double array columns, in
  * DOUBLE with a fixed left-to-right accumulation — bit-identical to the
  * higher-order-function formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)`) and to the SQL
  * oracle's `list_sum(list_transform(...))`.
  *
  * Exists because Spark's lambda HOFs are interpreted (no whole-stage
  * codegen) and re-evaluated per reference: one `cosine()` column spells
  * `dot` five times (value + two norms, each referenced twice through the
  * null guard), so a 64-dim similarity scan pays ~320 boxed lambda calls
  * per row. This expression is one fused primitive loop per call site,
  * codegen'd into the enclosing whole-stage pipeline (powers the ANN/
  * near-dup operators over `embeddings.parquet`; reference workload
  * `notebooks/f30k_vs_coco_vs_wicsmmir_v2.ipynb` similarity analyses).
  *
  * Semantics: null input or length mismatch → null (the HOF zip_with pads
  * the shorter side with null, poisoning the sum — same observable result);
  * null elements → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if okElem(a) && okElem(b) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<float|double> arguments, got $l, $r")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private lazy val leftElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  private lazy val rightElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = if (leftElem == FloatType) xs.getFloat(i).toDouble
              else xs.getDouble(i)
      val y = if (rightElem == FloatType) ys.getFloat(i).toDouble
              else ys.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, t: DataType, idx: String): String =
        if (t == FloatType) s"(double) $arr.getFloat($idx)"
        else s"$arr.getDouble($idx)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) {
              ${ev.isNull} = true; break;
            }
            $acc += ${get(a, leftElem, i)} * ${get(b, rightElem, i)};
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API (Spark 4 ColumnNode ↔ Catalyst Expression bridge). */
  def apply(a: Column, b: Column): Column =
    Bridge.column(new DotProduct(Bridge.expression(a), Bridge.expression(b)))

  private[graft] def build(exprs: Seq[Expression]): DotProduct = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"dot_product requires exactly 2 arguments, got ${exprs.length}")
    DotProduct(exprs.head, exprs(1))
  }

  /** Register as SQL function `dot_product`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", build, "built-in")
}
