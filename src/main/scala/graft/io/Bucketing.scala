package graft.io

import org.apache.spark.sql.DataFrame

/** Bucketed parquet tables — the pre-shuffle layout for repeated
  * co-located joins (builder scale list: "bucketing for co-located
  * joins").
  *
  * Writing both sides of a hot join bucketed+sorted on the join key
  * (same bucket count) lets every subsequent join/aggregation on that
  * key plan WITHOUT a shuffle exchange: each task zips bucket i of both
  * tables. At 100 TB this converts the recurring O(data) shuffle into a
  * one-time cost at write. Verified by plan assertion in
  * BucketingSpec (no Exchange under the join).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — plans as a
    * zero-exchange sort-merge join.
    */
  def joinCoLocated(spark: org.apache.spark.sql.SparkSession,
                    leftTable: String, rightTable: String,
                    keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
