package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a DataFrame computation (SURVEY §2.12 adjunct:
  * frequency estimation over unbounded key domains — heavy-hitter
  * detection, per-key rate limiting — where an exact per-key count is
  * the thing that does NOT scale).
  *
  * The sketch is a depth x width counter matrix: each row d has its own
  * hash; a key increments counters[d][hash_d(key) % width] for every d;
  * the estimate for a key is the MIN over its depth cells. Estimates
  * never undercount (every cell the key touches holds its true count
  * plus nonneg collision mass) and overcount by <= 2N/width with
  * probability 1 - 2^-depth — the classic CM guarantee.
  *
  * Spark shape: ONE pass over the data (explode to depth rows per
  * record — map-side partial aggregation compresses each task's output
  * to at most depth*width cells, so the shuffle is O(depth*width) per
  * task, independent of row count), one groupBy on (d, bucket). The
  * materialized sketch is depth*width rows — broadcastable; probing is
  * a broadcast join, never a shuffle of the probe side.
  *
  * The hash is the first 8 hex digits of md5("d:key") — uniform,
  * engine-portable (identical in DuckDB), and integer-exact, so the
  * whole sketch (not just its guarantee) is oracle-checkable.
  */
object Sketches {

  /** Bucket of `key` for depth row `d`: md5-derived uniform in
    * [0, width). conv() parses the 8 hex chars to a decimal string;
    * the long cast is exact (max 2^32-1).
    */
  def cmsBucket(key: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat_ws(":", lit(d.toString), key.cast("string"))),
      1, 8), 16, 10).cast("long") % width

  private def probeCells(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(d =>
      struct(lit(d).as("d"), cmsBucket(key, d, width).as("bucket"))): _*)

  /** Build the sketch: (d, bucket, counter), depth*width rows max. */
  def cmsBuild(df: DataFrame, keyCol: String, depth: Int, width: Int)
      : DataFrame =
    df.select(explode(probeCells(col(keyCol), depth, width)).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("counter"))

  /** Point-estimate every row of `keys` (one row per distinct key)
    * against a built sketch: min over the key's depth cells. The sketch
    * side is broadcast — the probe side never shuffles (the groupBy
    * after the join re-aggregates at most depth rows per key and reuses
    * the probe side's existing distribution).
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame =
    keys.select(col(keyCol),
        explode(probeCells(col(keyCol), depth, width)).as("cell"))
      .select(col(keyCol), col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(keyCol).agg(min("counter").as("cms_estimate"))

  /** md5-derived ±1 sign for the count-sketch row `d` (independent of
    * the bucket hash via a distinct salt). */
  private def csSign(key: Column, d: Int): Column =
    when(conv(substring(md5(concat_ws(":", lit(s"s$d"), key.cast("string"))),
      1, 8), 16, 10).cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L))

  /** Count-sketch (Charikar et al. 2002) build + estimate in one go:
    * counters C[d][h_d(k)] += s_d(k), estimate = MEDIAN over rows of
    * s_d(k)·C[d][h_d(k)] — unbiased (unlike CMS, whose min only
    * over-counts), at the cost of two-sided error. `depth` must be
    * odd so the median is a single exact element (picked by the
    * integer rank (depth+1)/2 over the sorted per-key probes, not a
    * float percentile). The sketch is depth·width counters — the
    * bounded state that makes the pattern shippable to 100 TB — and
    * the probe side broadcasts it exactly as [[cmsEstimate]] does.
    * Output per probed key: key, n_true, cs_estimate.
    */
  def countSketchEstimate(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth % 2 == 1 && depth >= 3, "depth must be odd >= 3")
    val cells = df.select(
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), cmsBucket(col(keyCol), d, width).as("bucket"),
            csSign(col(keyCol), d).as("s"))): _*)).as("c"))
      .groupBy(col("c.d").as("d"), col("c.bucket").as("bucket"))
      .agg(sum(col("c.s")).as("counter"))
    val truth = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_true"))
    val probes = truth.select(col(keyCol),
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), cmsBucket(col(keyCol), d, width).as("bucket"),
            csSign(col(keyCol), d).as("s"))): _*)).as("c"))
      .select(col(keyCol), col("c.d").as("d"), col("c.bucket").as("bucket"),
        col("c.s").as("s"))
      .join(broadcast(cells), Seq("d", "bucket"))
      .select(col(keyCol), (col("s") * col("counter")).as("est"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
      .orderBy(col("est"))
    val med = probes.withColumn("r", row_number().over(w))
      .filter(col("r") === (depth + 1) / 2)
      .select(col(keyCol), col("est").as("cs_estimate"))
    truth.join(med, Seq(keyCol))
  }
}
