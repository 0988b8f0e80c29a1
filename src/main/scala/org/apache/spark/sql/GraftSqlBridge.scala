package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversion (the Spark 4
  * ColumnNode split removed the public `new Column(expr)` constructor).
  * Lives in the spark.sql package purely to re-export the two
  * conversions the engine's native functions need.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
