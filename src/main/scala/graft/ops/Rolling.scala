package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rolling (sliding-row-frame) aggregates: per-key moving sum/average
  * over the last `nRows` rows in time order — the feature-engineering
  * primitive for per-entity trailing statistics.
  *
  * Scale shape: one shuffle on the partition keys, one sort per
  * partition, then a bounded O(nRows) frame slides once over each
  * partition inside WindowExec — no self-join, no range explosion, and
  * memory is bounded by the frame, not the partition.
  *
  * Determinism: the windowed sum runs over DECIMAL (exact, frame-order
  * independent) and is cast back to double at the end; the ordering
  * carries a unique tie-break column. The average divides the decimal
  * sum by the frame row count in double — one division, same operand
  * order on every engine.
  */
object Rolling {

  /** Append `moving_n`, `moving_sum`, `moving_avg` of `valueCol` over
    * the trailing `nRows`-row frame (including the current row).
    */
  def rollingSumAvg(df: DataFrame, partCols: Seq[String],
                    orderCols: Seq[Column], valueCol: String,
                    nRows: Int): DataFrame = {
    require(nRows > 0)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(-(nRows - 1L), Window.currentRow)
    val decSum = sum(col(valueCol).cast(DecimalType(18, 6))).over(w)
    val n = count(lit(1)).over(w)
    // both window aggregates land in ONE select (chained withColumn
    // would insert a Project between them and block CollapseWindow —
    // two Window execs instead of one), and moving_avg derives from the
    // materialized columns, never a re-instantiated window expression
    df.select(col("*"), n.as("moving_n"),
        decSum.cast("double").as("moving_sum"))
      .withColumn("moving_avg", col("moving_sum") / col("moving_n"))
  }
}
