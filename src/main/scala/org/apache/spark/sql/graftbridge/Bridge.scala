package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Column ↔ Catalyst Expression bridge for custom expressions.
  *
  * Spark 4 made the classic converters `private[sql]`
  * (`columnNodeSupport.scala` in the spark-sql module), so libraries adding
  * native `Expression`s need a shim compiled inside the `org.apache.spark
  * .sql` package tree — the established extension pattern (same technique
  * used by public Spark connectors for other `private[sql]` surfaces). */
object Bridge {
  def column(e: Expression): Column =
    Column(ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
