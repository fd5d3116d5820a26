package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): rows not dominated in
  * (minimize `xCol`, maximize `yCol`). Row a dominates row b when
  * a.x ≤ b.x ∧ a.y ≥ b.y with at least one strict — the
  * multi-objective curation selector (e.g. "no other document is both
  * cheaper in tokens and higher in quality").
  *
  * Scale shape is two-phase. Phase 1 prunes with a bucket sweep: bucket
  * rows by ⌊x/bucketWidth⌋, take max(y) per bucket (one map-side-
  * combined aggregation), compute the running max over strictly
  * smaller buckets (a window over the TINY bucket frame), broadcast it
  * back, and drop every row whose y is ≤ that running max — each such
  * row is dominated by a concrete smaller-x row, so the filter is
  * exact, and it shrinks the candidate set to roughly the frontier's
  * staircase. Phase 2 runs the textbook sweep on the survivors: with
  * m1 = max(y) over x' < x (integer RANGE frame) and m2 = max(y) over
  * x' = x, a row survives iff m1 < y (or none) and m2 = y. Only the
  * pruned candidate set — not the corpus — enters the global sort.
  * Dominance is transitive, so pruning dominated rows never changes
  * phase 2's verdict on the rest.
  */
object Skyline {

  /** Frontier of (`xCol` min, `yCol` max); `xCol` must be integral
    * (the exact sweep uses an integer RANGE frame). Output: the input
    * columns of the frontier rows, ordered by (x, id).
    */
  def frontier2d(df: DataFrame, xCol: String, yCol: String, idCol: String,
      bucketWidth: Int = 16): DataFrame = {
    require(bucketWidth >= 1)
    val withB = df.withColumn("__b", floor(col(xCol) / bucketWidth))
    val bmax = withB.groupBy(col("__b")).agg(max(col(yCol)).as("__by"))
    val wb = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val brun = bmax.select(col("__b"), max(col("__by")).over(wb).as("__run"))
    val pruned = withB.join(broadcast(brun), Seq("__b"))
      .filter(col("__run").isNull || col(yCol) > col("__run"))
    val w1 = Window.orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy(col(xCol))
    pruned
      .select(df.columns.map(col) :+
        max(col(yCol)).over(w1).as("__m1") :+
        max(col(yCol)).over(w2).as("__m2"): _*)
      .filter((col("__m1").isNull || col("__m1") < col(yCol))
        && col("__m2") <= col(yCol))
      .select(df.columns.map(col): _*)
      .orderBy(col(xCol), col(idCol))
  }
}
