package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the classic Column <-> Expression converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * This one-file bridge lives in the sql package solely to re-expose
  * them so graft's custom Catalyst expressions (graft.expr.*) can be
  * wrapped as user-facing Columns. No Spark internals are modified.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
