package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Day-bitmap activity analytics: each user's activity over a ≤ 64-day
  * window packs into ONE long (bit d = active on day d) with a
  * `bit_or` aggregation, and every downstream question — days active,
  * cross-signal overlap, coverage — becomes register-width bit math
  * (`bit_count`, `&`, `|`) instead of another distinct-aggregation
  * over the event log. This is the roaring-bitmap idea at its
  * degenerate (single-word) size: the event table is touched ONCE;
  * all analysis runs on |users| longs.
  *
  * Determinism: bit_or/bit_count are exact integer ops — no floats
  * anywhere until the final reported ratios.
  */
object Bitmaps {

  /** Per-user day bitmaps for two event signals + the activity
    * histogram: one row per distinct total-active-day count with the
    * user count and the summed day-overlap (bit_count(maskA & maskB))
    * of the two signals. `dayCol` must be an integer day index in
    * [0, 64). Signals are `typeCol = a` / `= b`; total activity spans
    * ALL rows.
    */
  def activityHistogram(df: DataFrame, userCol: String, dayCol: String,
      typeCol: String, a: String, b: String): DataFrame = {
    val bit = expr(s"shiftleft(1L, CAST($dayCol AS INT))")
    val masks = df.groupBy(col(userCol).as("u"))
      .agg(bit_or(bit).as("m_all"),
        bit_or(when(col(typeCol) === a, bit).otherwise(lit(0L)))
          .as("m_a"),
        bit_or(when(col(typeCol) === b, bit).otherwise(lit(0L)))
          .as("m_b"))
    masks
      .select(bit_count(col("m_all")).cast("long").as("active_days"),
        bit_count(col("m_a").bitwiseAND(col("m_b"))).cast("long")
          .as("overlap"))
      .groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"), sum(col("overlap")).as("overlap_days"))
      .orderBy("active_days")
  }
}
