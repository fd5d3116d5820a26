package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union per key (gaps-and-islands): merge overlapping /
  * touching [start, end) intervals and report coverage — "how much
  * wall-clock was this user active", session stitching, downtime math.
  *
  * Scale shape: one shuffle on the key, one per-key sort inside the
  * window (no global sort). The island assignment is the classic
  * running-max construction: an interval starts a new island iff its
  * start exceeds the running max end of everything before it — a
  * single window pass, then a plain rollup. Keys are independent, so
  * parallelism = key cardinality.
  *
  * Determinism: ordering totals on (start, end) per key; all math is
  * integer (caller supplies epoch-typed longs).
  */
object Intervals {

  /** Output: key, n_islands, covered (Σ island lengths, same unit as
    * the inputs).
    */
  def unionPerKey(df: DataFrame, keyCol: String, startCol: String,
                  endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val marked = df
      .withColumn("__new_island",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered"))
  }
}
