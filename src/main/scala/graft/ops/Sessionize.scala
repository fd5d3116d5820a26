package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based BATCH sessionization: assign each event to a per-user
  * session that ends when the inter-event gap exceeds a threshold. The
  * streaming twin is `session_window` (q22); this is the backfill/
  * reprocessing form that runs over landed history.
  *
  * Scale shape: ONE shuffle (hash partition by user), then two window
  * passes over the same (user, ts, tie) sort — Spark executes both in a
  * single WindowExec per ordering, so the sort happens once. Session
  * assignment never compares rows across users, so 100 TB of events
  * parallelizes by user cardinality, and no state beyond one partition's
  * sort spill is ever held.
  *
  * Determinism: gaps are compared in integer MICROSECONDS
  * (`unix_micros`, no double seconds), and the per-user ordering carries
  * an explicit unique tie-break column — two events on the same
  * timestamp order identically on every engine.
  */
object Sessionize {

  /** Append `session_idx` (0-based per user, in time order): a new
    * session starts where the gap from the previous event exceeds
    * `gapSeconds`.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val breakFlag = when(prev.isNull
      .or(unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(breakFlag).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - 1L)
  }

  /** Per-session rollup: event count + start/end timestamps. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   tieCol: String, gapSeconds: Long): DataFrame =
    sessionize(df, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
