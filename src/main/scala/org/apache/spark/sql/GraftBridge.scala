package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 removed the
  * public `new Column(expr)` constructor; libraries exposing custom
  * Catalyst expressions as Columns need this one-file shim.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
