package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column<->Expression converters — the
  * standard mechanism for libraries contributing custom Catalyst
  * expressions (Spark 4 moved Column onto ColumnNode; classic conversions
  * live behind package-private ExpressionUtils).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
