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

  /** 3-itemset mining: one row per canonical triple (a < b < c)
    * co-occurring in ≥ `minShared` baskets, with basket support ratio
    * and the 3-way lift `n²·s_abc/(s_a·s_b·s_c)` (>1 means the triple
    * co-occurs more than independence predicts).
    *
    * Scale shape: the pairwise self-join first (bounded as in
    * [[rules]]), then ONE more equi-join of qualifying pairs against
    * the facts on the basket key — the Apriori prune: a triple can
    * only reach `minShared` if its (a,b) prefix already did, so the
    * third leg joins a pre-shrunk frame, never a basket³ explosion.
    * The distinct-item alphabet bounds the output (≤ |items|³/6 rows).
    */
  def tripleRules(df: DataFrame, basketCol: String, itemCol: String,
      minShared: Long): DataFrame = {
    val facts = df.select(col(basketCol).as("g"), col(itemCol).as("item"))
      .distinct()
    val pairs = facts.select(col("g"), col("item").as("a"))
      .join(facts.select(col("g"), col("item").as("b")), Seq("g"))
      .where(col("a") < col("b"))
    val prefix = pairs.groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
      .where(col("s_ab") >= minShared).select(col("a"), col("b"))
    val tripleSup = pairs.join(prefix, Seq("a", "b"), "left_semi")
      .join(facts.select(col("g"), col("item").as("c")), Seq("g"))
      .where(col("b") < col("c"))
      .groupBy("a", "b", "c").agg(count(lit(1)).as("s_abc"))
      .where(col("s_abc") >= minShared)
    val itemSup = facts.groupBy(col("item")).agg(count(lit(1)).as("s"))
    val total = facts.agg(countDistinct(col("g")).as("n_baskets"))
    tripleSup
      .join(itemSup.select(col("item").as("a"), col("s").as("s_a")), "a")
      .join(itemSup.select(col("item").as("b"), col("s").as("s_b")), "b")
      .join(itemSup.select(col("item").as("c"), col("s").as("s_c")), "c")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("c"), col("s_abc"),
        round(col("s_abc").cast("double")
          / col("n_baskets").cast("double"), 6).as("support"),
        round(col("n_baskets").cast("double")
          * col("n_baskets").cast("double")
          * col("s_abc").cast("double") / col("s_a").cast("double")
          / col("s_b").cast("double") / col("s_c").cast("double"), 6)
          .as("lift3"))
  }
}
