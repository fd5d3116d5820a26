package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Winsorized (outlier-clipped) group statistics: per group, clip the
  * value column at exact lower/upper percentiles and report robust
  * mean/min/max alongside the clip bounds — the profiling step that
  * keeps a handful of corrupt readings from dominating a column
  * summary.
  *
  * Scale shape: two hash aggregations on the group key (one to derive
  * the exact percentile bounds, one to fold the clipped values), both
  * with map-side partials; the bounds frame is group-cardinality-sized
  * and broadcasts back. Exact percentiles sort per group inside the
  * aggregate — right for bounded group sizes; at web scale swap the
  * bounds stage for approx_percentile and keep the identical clip fold.
  *
  * Determinism: bounds round to 6 dp (sub-ulp interpolation agreement),
  * the clipped mean sums through DECIMAL — order-independent at any
  * parallelism and portable to the SQL oracle.
  */
object Winsorize {

  def stats(df: DataFrame, groupCol: String, valCol: String,
            pLow: Double = 0.05, pHigh: Double = 0.95): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh,
      s"need 0 <= pLow < pHigh <= 1 (got $pLow, $pHigh)")
    val bounds = df.groupBy(col(groupCol))
      .agg(round(percentile(col(valCol), lit(pLow)), 6).as("lo"),
        round(percentile(col(valCol), lit(pHigh)), 6).as("hi"))
    // internal name cannot collide with a user valCol named "v"
    val clipped = df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("__winsor_v",
        least(greatest(col(valCol), col("lo")), col("hi")))
    clipped.groupBy(col(groupCol))
      .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        // exact decimal sum, ONE double division — avg(DECIMAL) would
        // accumulate in double on some engines (order-dependent)
        round(sum(col("__winsor_v").cast(DecimalType(28, 6))).cast("double") /
          count(lit(1)), 6).as("winsor_mean"),
        count(lit(1)).as("n"),
        sum(when(col(valCol) < col("lo"), 1L)
          .when(col(valCol) > col("hi"), 1L).otherwise(0L)).as("n_clipped"))
  }
}
