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

  /** Eagerly convert a composed Column to a concrete Catalyst
    * expression tree. [[expression]] wraps non-trivial columns in a
    * lazy `ColumnNodeExpression`, which the classic Dataset API resolves
    * but the `FunctionRegistry` path does not (an injected SQL function
    * must hand the analyzer a real expression — the lazy wrapper
    * surfaces as an unresolvable VOID). */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
