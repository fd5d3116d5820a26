package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream to a fixed
  * grid per key and forward-fill gaps — the feature-engineering move
  * that turns irregular observations into model-ready rows.
  *
  * Shape: (1) one aggregate picks each key's per-bucket representative
  * (max_by on a unique tie-break id — deterministic, unlike first());
  * (2) the grid is generated per key from its own min/max bucket
  * (sequence + explode — rows are created distributed, never on the
  * driver); (3) one window per key carries the last observation
  * forward. Two shuffles on the key total (agg; the grid join and
  * window reuse the same clustering). Grid size is bounded by span /
  * step per key — the caller owns choosing a step coarse enough that
  * |grid| stays O(|events|) at 100 TB.
  */
object Resample {
  /** Hourly grid + forward fill of `valueCol`, representatives chosen
    * by max `tieCol` among non-null observations in the bucket.
    */
  def hourlyFfill(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, tieCol: String): DataFrame = {
    val hourly = df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(max_by(col(valueCol), col(tieCol)).as("v"))
    val grid = df.groupBy(col(keyCol))
      .agg(date_trunc("hour", min(col(tsCol))).as("h0"),
        date_trunc("hour", max(col(tsCol))).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("h"))
    val w = Window.partitionBy(keyCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "h"), "left")
      .withColumn("v_ff", last(col("v"), ignoreNulls = true).over(w))
      .select(col(keyCol), col("h"), col("v_ff"))
  }
}
