package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import graft.plans.TopKPerGroupPlan

/** Direct API over the custom [[graft.plans.TopKPerGroupPlan]]
  * operator (see its scaladoc for the execution shape): top `k` rows
  * per group by `orderCols`, WITHOUT sorting whole groups and without
  * shuffling more than the per-partition survivors.
  *
  * Equivalent to `row_number().over(Window.partitionBy(groupCols)
  * .orderBy(orderCols)) <= k` (which `GraftTopKRule` rewrites to this
  * same operator when the session has GraftExtensions); this entry
  * point exists for callers building plans programmatically.
  */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[Column],
               orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = SparkSession.active
    val child = GraftExpressionBridge.logicalPlan(df)
    val order = orderCols.map(GraftExpressionBridge.expression(spark, _) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    GraftExpressionBridge.dataFrame(spark,
      TopKPerGroupPlan(
        groupCols.map(GraftExpressionBridge.expression(spark, _)),
        order, k, rank = None, child))
  }
}
