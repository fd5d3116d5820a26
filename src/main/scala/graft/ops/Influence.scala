package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-level data valuation for a simple linear fit: leave-one-group
  * -out (LOGO) influence — how much the global OLS slope moves when a
  * whole group's rows are deleted. The training-data-curation analog
  * of influence functions: a group with large |Δβ| is either
  * high-leverage signal or contamination.
  *
  * No refit per group: OLS over sums is algebraic, so the left-out
  * slope comes from (total sums − group sums) — exact integer
  * subtractions over one pass of per-group moment sums. The slope
  * combination `(n·Sxy − Sx·Sy)/(n·Sxx − Sx²)` runs in DOUBLE with
  * every factor cast before multiplying (the raw integer products can
  * exceed 64 bits at corpus scale; identical IEEE op order on any
  * engine).
  *
  * Scale shape: ONE hash aggregation on the group key; totals reduce
  * from the per-group frame (tiny) and broadcast back. The fact table
  * is scanned once, shuffled once on the group key.
  */
object Influence {

  private def beta(n: org.apache.spark.sql.Column,
      sx: org.apache.spark.sql.Column, sy: org.apache.spark.sql.Column,
      sxy: org.apache.spark.sql.Column, sxx: org.apache.spark.sql.Column) =
    (n.cast("double") * sxy.cast("double")
      - sx.cast("double") * sy.cast("double")) /
    (n.cast("double") * sxx.cast("double")
      - sx.cast("double") * sx.cast("double"))

  /** LOGO slope influence. `df`: (groupCol, x: Long, y: Long) with
    * exact integer x/y (caller pre-quantizes); `yScale` converts y
    * back to its real scale for the reported slopes. Output per
    * group: n_rows, beta_global, beta_loo, delta_beta (6 dp).
    */
  def logoSlope(df: DataFrame, groupCol: String,
      yScale: Double): DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("ng"), sum("x").as("sxg"), sum("y").as("syg"),
        sum(col("x") * col("y")).as("sxyg"),
        sum(col("x") * col("x")).as("sxxg"))
    val tot = g.agg(sum("ng").as("n"), sum("sxg").as("sx"),
      sum("syg").as("sy"), sum("sxyg").as("sxy"), sum("sxxg").as("sxx"))
    val j = g.crossJoin(broadcast(tot))
    val bG = beta(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"))
    val bL = beta(col("n") - col("ng"), col("sx") - col("sxg"),
      col("sy") - col("syg"), col("sxy") - col("sxyg"),
      col("sxx") - col("sxxg"))
    j.select(col(groupCol), col("ng").as("n_rows"),
      round(bG / yScale, 6).as("beta_global"),
      round(bL / yScale, 6).as("beta_loo"),
      round((bL - bG) / yScale, 6).as("delta_beta"))
  }
}
