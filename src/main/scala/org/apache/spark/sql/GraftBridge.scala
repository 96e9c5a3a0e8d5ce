package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 made `Column` node-based; the classic converters
  * are `private[sql]`, so this one-file shim lives in the sql package —
  * the same pattern public Spark extensions use (see SNIPPETS.md [1][3]).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
