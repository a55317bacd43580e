package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column ↔ Expression
  * converters, the standard pattern for libraries that register custom
  * Catalyst expressions (Spark 4 wraps Column around ColumnNode, so
  * `new Column(expr)` no longer exists).
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
