package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the dataset-versioning primitive: given two
  * snapshots of a keyed table, classify every key as added / removed /
  * changed (unchanged rows drop out). The workhorse behind "what moved
  * between crawl N and crawl N+1" audits and incremental re-processing
  * decisions.
  *
  * Scale shape: ONE full-outer shuffle join on the key — both sides
  * shuffle once, AQE handles skew, and the value comparison is a
  * null-safe expression per row. No driver state; output is typically
  * a small fraction of either snapshot.
  */
object Diff {

  /** `compareCols` are compared null-safely; all old_/new_ values are
    * carried for changed keys.
    */
  def snapshots(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(col(keyCol).as("key") +:
      compareCols.map(c => col(c).as(s"old_$c")): _*)
    val n = newDf.select(col(keyCol).as("key") +:
      compareCols.map(c => col(c).as(s"new_$c")): _*)
    val allEq = compareCols.map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    // presence flags survive the outer join even when every compared
    // column is null on one side
    val joined = o.withColumn("in_old", lit(true))
      .join(n.withColumn("in_new", lit(true)), Seq("key"), "full_outer")
    joined.withColumn("change_type",
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(allEq, "unchanged")
          .otherwise("changed"))
      .filter(col("change_type") =!= "unchanged")
      .drop("in_old", "in_new")
  }
}
