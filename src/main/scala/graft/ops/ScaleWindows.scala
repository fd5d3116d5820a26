package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level replacements for unpartitioned analytic windows.
  *
  * `Window.orderBy(v)` with no partition spec moves the WHOLE input to
  * one partition — the classic 100×-scale killer
  * (`GlobalWindowAuditSpec` now rejects it over row-scale frames).
  * These helpers compute the same exact results with the
  * [[graft.ops.ext.Sharding.assignShards]] recipe generalized to any
  * numeric order key:
  *
  *  1. split the key's [min, max] into 64 contiguous fixed-width
  *     ranges (bucket id is monotone in the key, so bucket-local order
  *     + bucket order = global order);
  *  2. run the window INSIDE each bucket in parallel (one hash
  *     shuffle on the bucket id);
  *  3. fold the ≤64 per-bucket summaries (counts / sums / minima) into
  *     global offsets with a window over that broadcast-size aggregate
  *     — the only unpartitioned window left, walking ≤64 rows.
  *
  * Results are EXACT and bucket-placement-independent: offsets restore
  * precisely the contribution of earlier buckets, so skewed buckets
  * cost parallelism, never correctness. Keys must be non-null numeric
  * (casts to double only for BUCKETING — ordering keeps the original
  * column type). A constant key degrades to one bucket (the caller's
  * data has no order to parallelize over in that case anyway).
  */
object ScaleWindows {

  private val NBuckets = 64

  /** Appends `__b`: the contiguous range bucket (0..63) of `vCol`,
    * monotone in the key. One broadcast of the (min, max) frame.
    */
  private def withBucket(df: DataFrame, vCol: String): DataFrame = {
    val v = col(vCol).cast("double")
    val bounds = df.agg(min(v).as("__vmin"), max(v).as("__vmax"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__b",
        when(col("__vmax") <= col("__vmin"), lit(0))
          .otherwise(least(lit(NBuckets - 1), greatest(lit(0),
            floor((v - col("__vmin"))
              / ((col("__vmax") - col("__vmin")) / NBuckets)).cast("int")))))
      .drop("__vmin", "__vmax")
  }

  /** Exclusive per-bucket offsets from a per-bucket summary `agg` —
    * the ≤64-row frame whose prefix window is the one allowed
    * unpartitioned window (it sits above the Aggregate).
    */
  private def offsets(perBucket: DataFrame, totalCol: String,
      zero: Column): DataFrame =
    perBucket.withColumn("__off",
        coalesce(sum(col(totalCol)).over(
          Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)),
          zero))
      .select(col("__b"), col("__off"))

  /** Exact global `row_number()` in ascending (`vCol`, tieCols…) order
    * — the scale-safe `row_number().over(Window.orderBy(...))`.
    * Appends `out` (LongType, 1-based).
    */
  def globalRowNumber(df: DataFrame, vCol: String, tieCols: Seq[String],
      out: String): DataFrame = {
    val b = withBucket(df, vCol)
    val localW = Window.partitionBy("__b")
      .orderBy((vCol +: tieCols).map(col): _*)
    val local = b.withColumn("__lrn", row_number().over(localW).cast("long"))
    val offs = offsets(
      local.groupBy("__b").agg(count(lit(1)).as("__bc")), "__bc", lit(0L))
    local.join(broadcast(offs), Seq("__b"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__b", "__lrn", "__off")
  }

  /** Exact inclusive global prefix sum of `valueCol` in ascending
    * (`vCol`, tieCols…) order. Appends `out` (the input sum type).
    */
  def globalPrefixSum(df: DataFrame, vCol: String, tieCols: Seq[String],
      valueCol: String, out: String): DataFrame = {
    val b = withBucket(df, vCol)
    val localW = Window.partitionBy("__b")
      .orderBy((vCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = b.withColumn("__lps", sum(col(valueCol)).over(localW))
    val offs = offsets(
      local.groupBy("__b").agg(sum(col(valueCol)).as("__bs")), "__bs",
      lit(0L))
    local.join(broadcast(offs), Seq("__b"))
      .withColumn(out, col("__off") + col("__lps"))
      .drop("__b", "__lps", "__off")
  }

  /** Exact inclusive running MIN of `valueCol` scanned in DESCENDING
    * (`vCol`, tieCols…) order — i.e. for each row, the min of
    * `valueCol` over all rows at-or-after it in ascending order (the
    * Benjamini–Hochberg tail scan). Appends `out`.
    */
  def globalSuffixMin(df: DataFrame, vCol: String, tieCols: Seq[String],
      valueCol: String, out: String): DataFrame = {
    val b = withBucket(df, vCol)
    val localW = Window.partitionBy("__b")
      .orderBy((vCol +: tieCols).map(c => col(c).desc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = b.withColumn("__lsm", min(col(valueCol)).over(localW))
    // min of all STRICTLY HIGHER buckets (rows later in ascending order)
    val offs = local.groupBy("__b").agg(min(col(valueCol)).as("__bm"))
      .withColumn("__btail",
        min(col("__bm")).over(Window.orderBy(col("__b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__b"), col("__btail"))
    local.join(broadcast(offs), Seq("__b"))
      .withColumn(out, least(col("__lsm"),
        coalesce(col("__btail"), col("__lsm"))))
      .drop("__b", "__lsm", "__btail")
  }
}
