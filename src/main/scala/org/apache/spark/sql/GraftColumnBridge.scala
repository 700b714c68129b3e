package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions — the
  * supported way for third-party libraries to expose custom Catalyst
  * expressions as `Column`s on Spark 4 (the old public `new
  * Column(expr)` constructor is gone).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
