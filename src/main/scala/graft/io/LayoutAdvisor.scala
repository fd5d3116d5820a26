package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Layout advisor: which column should a table be zone-mapped /
  * clustered on? For each candidate, measure how tightly the given
  * slicing (the table's commit/partition layout) bounds the candidate's
  * values: per-slice envelope widths summed, against the global width.
  *
  * `sum_widths / (n_slices * global_width)` is the expected fraction of
  * slices a uniformly-random point read must scan under zone-map
  * pruning (1/n_slices = perfect clustering, 1.0 = every slice
  * straddles everything — skipping is a property of LAYOUT, q429).
  * The census keeps the ratio as EXACT INTEGERS (sum, global, n) so the
  * oracle hashes bit-stably.
  *
  * One distributed pass: a single groupBy(slice) computing min/max per
  * candidate (map-side combine, |slices| result rows), then one fold of
  * that O(|slices|) frame per the whole candidate set. Nothing is
  * row-scale on the driver.
  */
object LayoutAdvisor {

  /** One row per candidate: (column, sum_widths, global_width,
    * n_slices), best-clustered first (ties by name).
    */
  def advise(df: DataFrame, slice: Column,
      candidates: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(candidates.nonEmpty)
    val perAggs = candidates.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"min_$c"),
      max(col(c).cast("long")).as(s"max_$c")))
    val per = df.groupBy(slice.as("__slice"))
      .agg(perAggs.head, perAggs.tail: _*)
    val foldAggs = candidates.flatMap(c => Seq(
      sum(col(s"max_$c") - col(s"min_$c") + 1L).as(s"sw_$c"),
      (max(col(s"max_$c")) - min(col(s"min_$c")) + 1L).as(s"gw_$c"))) :+
      count(lit(1)).as("__n")
    val r = per.agg(foldAggs.head, foldAggs.tail: _*).head()
    val n = r.getLong(2 * candidates.size)
    // "cand", not "column": the census replays this frame through the
    // DuckDB oracle, where COLUMN is reserved
    candidates.zipWithIndex.map { case (c, k) =>
      (c, r.getLong(2 * k), r.getLong(2 * k + 1), n)
    }.toDF("cand", "sum_widths", "global_width", "n_slices")
      .orderBy(
        (col("sum_widths").cast("double") / col("global_width")).asc,
        col("cand").asc)
  }
}
