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

  /** Per-key exponential smoothing: s₁ = x₁, sᵢ = α·xᵢ + (1−α)·sᵢ₋₁
    * over the rows of each key in `orderCols` order. Output: one row
    * per key with `n_events`, the final `ewma`, and the plain `mean`
    * for contrast (DECIMAL-summed, the q56 rule).
    *
    * EWMA is inherently a sequential fold, so the shape is one hash
    * aggregation collecting each key's ordered (order, value) array,
    * then a codegen'd `aggregate` fold over it — a left fold starting
    * from the first ELEMENT (not a zero), which DuckDB's list_reduce
    * reproduces operation-for-operation. Per-key state is the key's
    * own history: bounded keys at 100 TB ride the hash agg; unbounded
    * history belongs to the streaming twin (mapGroupsWithState), not
    * this batch fold. α must be an exact binary fraction (0.25, 0.5)
    * so `1−α` is bit-identical across engines.
    */
  def ewma(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
           valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1)
    val sorted = df.groupBy(keyCols.map(col): _*)
      .agg(
        sort_array(collect_list(struct(
          orderCols :+ col(valueCol).cast("double").as("__v"): _*))).as("__s"),
        sum(col(valueCol).cast(DecimalType(18, 6))).as("__sum"),
        count(lit(1)).as("n_events"))
    val vals = transform(col("__s"), e => e.getField("__v"))
    sorted.select(
      keyCols.map(col) ++ Seq(
        col("n_events"),
        round(aggregate(
          slice(vals, lit(2), size(vals) - 1), element_at(vals, 1),
          (s, x) => lit(alpha) * x + lit(1.0 - alpha) * s), 6).as("ewma"),
        round(col("__sum").cast("double") / col("n_events"), 6).as("mean")): _*)
  }

  /** Exact trailing-window DISTINCT count: for each integer period
    * `idx`, the number of distinct `keyCol` values seen in periods
    * [idx − win + 1, idx]. The naive plans — a running distinct state
    * or an idx-range self-join — blow up at scale; this fans each
    * (period, key) pair out to the ≤ `win` windows it participates in
    * (one bounded `sequence` explode) and counts per window with one
    * hash aggregation. Shuffle volume = win × |distinct (idx, key)|,
    * independent of row count. Output per idx: `n_distinct` (trailing)
    * and `n_daily` (that period alone); only periods present in the
    * data appear.
    */
  def trailingDistinct(df: DataFrame, idxCol: String, keyCol: String,
                       win: Int): DataFrame = {
    require(win >= 1 && win <= 400)
    val pk = df.select(col(idxCol).as("i"), col(keyCol).as("k")).distinct()
      .persist()
    val present = pk.select(col("i")).distinct()
    val fan = pk.select(explode(sequence(col("i"),
        col("i") + lit(win - 1))).as("t"), col("k"))
      .join(present.select(col("i").as("t")), Seq("t"))
      .groupBy(col("t")).agg(countDistinct(col("k")).as("n_distinct"))
    val daily = pk.groupBy(col("i").as("t"))
      .agg(countDistinct(col("k")).as("n_daily"))
    fan.join(daily, Seq("t")).select(col("t").as(idxCol),
      col("n_distinct"), col("n_daily"))
  }

  /** Trailing-window OLS slope: for each period idx, the regression
    * slope of the quantized value over the periods [idx − win + 1,
    * idx] — the rolling-trend feature. Same bounded ×win fan-out as
    * [[trailingDistinct]] (each (period, value) row feeds ≤ win
    * windows), then the per-window slope is the closed form over
    * EXACT integer moment sums (Σx, Σy, Σxy, Σx², all longs — x is
    * the period index, y the quantized value). One hash aggregation;
    * no self-join, no per-window sort. Windows with < 2 distinct
    * periods report null slope. Output per idx: n, slope (6 dp).
    */
  def trailingOlsSlope(df: DataFrame, idxCol: String, valCol: String,
                       win: Int): DataFrame = {
    require(win >= 2 && win <= 400)
    val pv = df.select(col(idxCol).as("i"), col(valCol).as("y"))
    val present = pv.select(col("i")).distinct()
    val fan = pv.select(explode(sequence(col("i"),
        col("i") + lit(win - 1))).as("t"), col("i").as("x"), col("y"))
      .join(present.select(col("i").as("t")), Seq("t"))
    val mom = fan.groupBy(col("t"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        countDistinct(col("x")).as("nx"))
    mom.select(col("t").as(idxCol), col("n"),
      round(when(col("nx") > 1,
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")), 6).as("slope"))
  }

  /** Exact trailing-window quantile of an integer-quantized value:
    * for each period `idx`, the q-th percentile (disc — smallest v
    * with cum ≥ ⌈q·n⌉) over values from periods [idx − win + 1, idx].
    * Same bounded fan-out shape as [[trailingDistinct]]: each
    * (period, value) count fans to ≤ `win` windows, the per-window
    * distribution aggregates by value, and the pick walks the
    * VALUE-DOMAIN cum (a per-window window over distinct values, not
    * rows). All counts integral; the ⌈q·n⌉ rank uses the exact
    * integer form (num·n + den − 1) div den. Output per idx: `n`,
    * `p` (the quantile value, still in the quantized domain).
    */
  def trailingQuantile(df: DataFrame, idxCol: String, valCol: String,
                       win: Int, qNum: Int, qDen: Int): DataFrame = {
    require(win >= 1 && win <= 400 && qNum > 0 && qDen >= qNum)
    val pv = df.select(col(idxCol).as("i"), col(valCol).as("v"))
      .groupBy("i", "v").agg(count(lit(1)).as("c")).persist()
    val present = pv.select(col("i")).distinct()
    val fan = pv.select(explode(sequence(col("i"),
        col("i") + lit(win - 1))).as("t"), col("v"), col("c"))
      .join(present.select(col("i").as("t")), Seq("t"))
      .groupBy(col("t"), col("v")).agg(sum(col("c")).as("c"))
    val w = Window.partitionBy("t").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("t")
    fan
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(tot))
      .withColumn("k",
        expr(s"($qNum * n + $qDen - 1) div $qDen"))
      .filter(col("cum") >= col("k"))
      .groupBy(col("t"), col("n"))
      .agg(min(col("v")).as("p"))
      .select(col("t").as(idxCol), col("n"), col("p"))
  }
}
