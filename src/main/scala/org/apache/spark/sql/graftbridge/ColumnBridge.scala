package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge. `ExpressionUtils` is `private[sql]`,
  * so this one-file accessor lives under the `org.apache.spark.sql` package —
  * the standard pattern for libraries that define native Catalyst
  * expressions against the classic (non-Connect) API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a catalyst expression.
    * [[expression]] returns a lazy `ColumnNodeExpression` wrapper, which is
    * fine inside the Dataset API (the analyzer unwraps it at plan
    * construction) but Unevaluable when returned from a FunctionRegistry
    * builder — builders substitute AFTER that unwrapping phase. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
