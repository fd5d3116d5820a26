package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining over (basket, item) facts: support,
  * directional confidence and lift for every item pair co-occurring in
  * at least `minShared` baskets.
  *
  * Scale shape: identical to [[Graph.coOccurrenceEdges]] — pair
  * generation is one self equi-join on the basket key, O(size²) per
  * basket on a caller-bounded basket size. Item supports are one
  * aggregation; the basket total is a broadcast 1-row frame. The only
  * floats are the three reported ratios, each a single fixed-order
  * division over exact integer counts.
  */
object Association {

  /** One row per canonical pair (a < b): basket supports `s_a`, `s_b`,
    * `s_ab`, confidences `conf_ab` = s_ab/s_a and `conf_ba` = s_ab/s_b,
    * and `lift` = n·s_ab / (s_a·s_b) (all 6 dp).
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minShared: Long): DataFrame = {
    val facts = df.select(col(basketCol).as("g"), col(itemCol).as("item"))
      .distinct()
    val pairSup = facts.select(col("g"), col("item").as("a"))
      .join(facts.select(col("g"), col("item").as("b")), Seq("g"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
      .where(col("s_ab") >= minShared)
    val itemSup = facts.groupBy(col("item")).agg(count(lit(1)).as("s"))
    val total = facts.agg(countDistinct(col("g")).as("n_baskets"))
    pairSup
      .join(itemSup.select(col("item").as("a"), col("s").as("s_a")), "a")
      .join(itemSup.select(col("item").as("b"), col("s").as("s_b")), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("s_a"), col("s_b"), col("s_ab"),
        round(col("s_ab").cast("double") / col("s_a"), 6).as("conf_ab"),
        round(col("s_ab").cast("double") / col("s_b"), 6).as("conf_ba"),
        round(col("n_baskets").cast("double") * col("s_ab") /
          (col("s_a") * col("s_b")), 6).as("lift"))
  }
}
