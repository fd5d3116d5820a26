package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join, re-expressed as an equi-join.
  *
  * The naive form `points.join(intervals, p >= lo && p <= hi)` has no
  * equi-key, so Spark plans a BroadcastNestedLoopJoin (or a cartesian
  * product when neither side fits in a broadcast) — an all-pairs scan
  * that cannot survive a large interval table. The standard scale-out
  * shape instead quantizes the domain into fixed-width bins:
  *
  *  - each POINT belongs to exactly one bin: floor(p / binWidth);
  *  - each INTERVAL is exploded to the bins it overlaps
  *    (floor(lo/w) .. floor(hi/w));
  *  - bins equi-join, then the exact predicate `lo <= p <= hi` filters
  *    bin-mates that don't truly overlap.
  *
  * Because a point has exactly ONE bin, every matching (point,
  * interval) pair is produced exactly once — no post-join dedup needed.
  * The equi-join shuffles on the bin key (hash-partitioned, AQE can
  * split skewed bins), and the interval explosion factor is
  * len/binWidth + 1, so `binWidth` near the typical interval length
  * keeps the blow-up ~2x. Works on any integral domain (epoch days,
  * epoch seconds, IP-as-long); values must stay within 2^52 so the
  * double-precision floor division is exact.
  *
  * Reference analogue: the reference's manifests only do equi lookups
  * (run_annotate.py join semantics); this operator is part of the
  * beyond-reference §2.12 surface (interval/event-window analytics).
  */
object RangeJoin {

  /** Join `points` to every interval of `intervals` containing them
    * (inclusive on both ends). `pointCol`, `startCol`, `endCol` must be
    * integral columns in the same unit. Output = point columns +
    * interval columns (bin key dropped).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(iv, "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
