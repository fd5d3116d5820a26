package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics per group: the profiling aggregates that
  * approx sketches (q80's certified percentile, q52's HLL) trade away,
  * for when the group count is modest and exactness is the point.
  *
  * - exact median via Spark's `percentile` (linear interpolation on
  *   even counts — the SQL-standard continuous percentile, identical
  *   in DuckDB's `median`);
  * - deterministic mode: value counts + a (count desc, value asc)
  *   rank, so ties always resolve to the smallest value — unlike the
  *   built-in `mode()` whose tie winner is accumulation-order luck.
  *
  * Scale shape: one shuffle on (group, value) for the mode counts, one
  * on group for the median; both are plain hash aggregations with
  * map-side partials. The mode's rank window partitions by group —
  * parallel across groups, never global.
  */
object GroupStats {

  def medianMode(df: DataFrame, groupCol: String, medianCol: String,
                 modeCol: String): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(medianCol), lit(0.5)).as("median_val"),
        count(lit(1)).as("n"))
    val counts = df.groupBy(col(groupCol), col(modeCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col(modeCol))
    val mode = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(groupCol), col(modeCol).as("mode_val"),
        col("cnt").as("mode_count"))
    med.join(mode, Seq(groupCol))
  }

  /** Robust per-group outlier screen: median/MAD with the normal
    * consistency constant (1.4826), flagging |x - med| > k·1.4826·MAD.
    * Three grouped passes (median, MAD, flag-count), each joined back
    * by BROADCAST — the group-stats frames are one row per group, so
    * the big frame never shuffles after its grouped aggregations.
    * Exact `percentile` holds a group's values in memory; at 100 TB
    * swap both medians for `approx_percentile` (same shape, sketched
    * state) — the outlier verdict tolerates percentile error far
    * smaller than k·MAD.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val g = col(groupCol)
    val x = graft.Cols.ref(valueCol).cast("double")
    val med = df.groupBy(g).agg(percentile(x, lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .select(g, x.as("x"), col("med"),
        abs(x - col("med")).as("adev"))
    val mad = dev.groupBy(g)
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(g)
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"),
        sum(when(col("adev") > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Per-group weighted (lower) median: the smallest value whose
    * cumulative integer weight reaches half the group total —
    * 2·cum ≥ total, a pure integer comparison, so the selection is
    * exact with no float threshold. One shuffle on the group key, one
    * sort per group (the window), cumulative Long sums.
    * Output: (group, total_w, wmedian).
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, tieCols: Seq[String]): DataFrame = {
    val wc = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol) +: tieCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col(groupCol))
    df.select(col(groupCol) +: col(valueCol) +: col(weightCol).as("__w") +:
        tieCols.map(col): _*)
      .select(col(groupCol), col(valueCol),
        sum(col("__w")).over(wc).as("__cum"),
        sum(col("__w")).over(wt).as("total_w"))
      .filter(col("__cum") * 2 >= col("total_w"))
      .groupBy(col(groupCol), col("total_w"))
      .agg(min(col(valueCol)).as("wmedian"))
  }

  /** Per-group Gini coefficient of a non-negative INTEGER column:
    * G = (2·Σi·x(i) − (n+1)·Σx) / (n·Σx) with x sorted ascending —
    * the mixture-balance concentration metric (0 = uniform, →1 = one
    * giant). All sums are exact integer arithmetic (rank·value
    * products summed as Longs); one double division at the end.
    */
  def gini(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val wr = Window.partitionBy(col(groupCol))
      .orderBy(col("__x"), col(tieCol))
    df.select(col(groupCol), col(valueCol).cast("long").as("__x"),
        col(tieCol))
      .select(col(groupCol), col("__x"),
        row_number().over(wr).cast("long").as("__i"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col("__i") * col("__x")).as("__six"))
      .select(col(groupCol), col("n"),
        round((lit(2L) * col("__six") - (col("n") + 1) * col("__sx"))
          .cast("double") / (col("n") * col("__sx")), 6).as("gini"))
  }

  /** Hierarchy share rollup ("ratio to parent"): for each prefix level
    * of `levels` (e.g. region → nation → segment), the level's integer
    * value sum and its share of the PARENT aggregate — the OLAP
    * drill-down companion to rollup (q39), which emits totals but not
    * the parent-relative ratios dashboards actually plot. One hash
    * aggregation at the deepest level; every coarser level re-sums the
    * child frame (tiny), and shares join child to parent on the prefix
    * key. All sums exact longs; each share is one division. Output
    * long-form: (level, key, value, parent_share 6 dp), where `key`
    * joins the level's member values with '/', and the root's share
    * is 1.0.
    */
  def ratioToParent(df: DataFrame, levels: Seq[String],
      valueCol: String): DataFrame = {
    require(levels.nonEmpty)
    val deepest = df.groupBy(levels.map(col): _*)
      .agg(sum(col(valueCol)).as("v")).persist()
    val total = deepest.agg(sum(col("v")).as("pv"))
    val frames = levels.indices.map { i =>
      val keys = levels.take(i + 1)
      val lvl = deepest.groupBy(keys.map(col): _*)
        .agg(sum(col("v")).as("v"))
      val joined = if (i == 0) lvl.crossJoin(broadcast(total))
      else {
        val parent = deepest.groupBy(levels.take(i).map(col): _*)
          .agg(sum(col("v")).as("pv"))
        lvl.join(broadcast(parent), levels.take(i))
      }
      joined.select(lit(levels(i)).as("level"),
        concat_ws("/", keys.map(c => col(c).cast("string")): _*).as("key"),
        col("v").as("value"),
        round(col("v").cast("double") / col("pv").cast("double"), 6)
          .as("parent_share"))
    }
    frames.reduce(_ unionByName _)
  }
}
