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

  /** Eager Column -> catalyst Expression through the session's column
    * node converter (the conversion classic.Dataset applies at its API
    * boundary). The lazy `expression(c)` wrapper above is only
    * evaluable where Spark itself unwraps it; plans built OUTSIDE the
    * Dataset API (graft.plans.*) need the converted tree — unresolved
    * attributes in it then resolve normally against the child.
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Analyzed logical plan of a DataFrame (classic runtime only). */
  def logicalPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame (`Dataset.ofRows` is
    * `private[sql]` in Spark 4) — how graft's custom plan nodes
    * (graft.plans.*) become user-facing DataFrames.
    */
  def dataFrame(spark: SparkSession,
                plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
