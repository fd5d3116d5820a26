package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: merged vs single-pass HLL estimate deltas per scale. */
object DevSketch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val partials = docs.groupBy("lang", "source")
        .agg(hll_sketch_agg(col("doc_id")).as("sk"))
      val merged = partials.groupBy("lang")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("m"))
      val single = docs.groupBy("lang")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("s1"),
          countDistinct(col("doc_id")).as("ex"))
      single.join(merged, "lang").orderBy("lang")
        .select(col("lang"), col("ex"), col("s1"), col("m"),
          (abs(col("m") - col("s1")) * 100.0 / col("ex")).as("merge_diff_pct"),
          (abs(col("m") - col("ex")) * 100.0 / col("ex")).as("err_pct"))
        .show(20, false)
    }
    spark.stop()
  }
}
