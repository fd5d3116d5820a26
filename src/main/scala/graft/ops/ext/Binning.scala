package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monotone risk binning: the credit-scoring "optimal binning" step —
  * bucket a numeric feature, isotonic-fit the event rate over the
  * bucket order (so the risk curve is monotone by construction), and
  * merge adjacent buckets sharing an isotonic level into final bins,
  * each with its Laplace-adjusted weight of evidence.
  *
  * The isotonic fit uses PAV's minimax characterization
  * `iso(b) = max_{i≤b} min_{j≥b} rate(i..j)` — two bounded
  * aggregations over O(K²) bucket pairs instead of a sequential
  * pool-adjacent scan, so the fit DISTRIBUTES (same device as q202).
  * Bin boundaries come from level changes along the bucket order
  * (lag + cumulative sum over a K-row frame).
  *
  * Scale shape: the corpus reduces to K bucket rows in one hash
  * aggregation; everything after is K²-bounded. Bucket edges are
  * integer arithmetic over broadcast min/max.
  */
object Binning {

  /** `df`: (x: Long, y: Long 0/1). Output one row per monotone bin:
    * bin, bucket_lo, bucket_hi, n, pos, iso_rate, woe.
    */
  def monotoneBins(df: DataFrame, k: Int): DataFrame = {
    val bounds = df.agg(min("x").as("xmin"), max("x").as("xmax"))
    val bucketed = df.crossJoin(broadcast(bounds))
      .select(expr(s"least($k - 1, (x - xmin) * $k div (xmax - xmin + 1))")
        .as("bucket"), col("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
    val wr = Window.orderBy("bucket")
    val pr = bucketed
      .withColumn("rn", row_number().over(wr))
      .withColumn("cs", sum("cnt").over(wr))
      .withColumn("ps", sum("pos").over(wr))
    val pairs = pr.as("j").join(pr.as("i"), col("i.rn") <= col("j.rn"))
      .join(pr.as("i0"), col("i0.rn") === col("i.rn") - 1, "left")
      .select(col("i.rn").as("i"), col("j.rn").as("j"),
        ((col("j.ps") - coalesce(col("i0.ps"), lit(0L))).cast("double") /
          (col("j.cs") - coalesce(col("i0.cs"), lit(0L)))).as("avg"))
    val iso = pr.select(col("rn").as("r"), col("bucket"), col("cnt"),
        col("pos"))
      .join(pairs, col("i") <= col("r") && col("j") >= col("r"))
      .groupBy("r", "bucket", "cnt", "pos", "i").agg(min("avg").as("mn"))
      .groupBy("r", "bucket", "cnt", "pos").agg(max("mn").as("f"))
    // adjacent buckets on the same isotonic level merge into one bin
    val binned = iso
      .withColumn("chg",
        when(lag("f", 1).over(wr).isNull ||
          lag("f", 1).over(wr) =!= col("f"), 1L).otherwise(0L))
      .withColumn("bin", sum("chg").over(wr))
    val tot = binned.agg(sum("cnt").as("tn"), sum("pos").as("tp"))
    binned.groupBy("bin")
      .agg(min("bucket").as("bucket_lo"), max("bucket").as("bucket_hi"),
        sum("cnt").as("n"), sum("pos").as("pos"), min("f").as("f"))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("bucket_lo"), col("bucket_hi"), col("n"),
        col("pos"), round(col("f"), 6).as("iso_rate"),
        round(log(((col("pos").cast("double") + 0.5)
            / (col("tp").cast("double") + 0.5))
          / ((col("n") - col("pos")).cast("double") + 0.5)
          * ((col("tn") - col("tp")).cast("double") + 0.5)), 6)
          .as("woe"))
  }
}
