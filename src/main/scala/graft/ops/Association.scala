package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining over (basket, item) facts: support,
  * directional confidence and lift for every item pair co-occurring in
  * at least `minShared` baskets.
  *
  * Scale shape: like [[Graph.coOccurrencePairCounts]] — ONE shuffle on
  * the basket key builds per-basket sorted distinct item arrays, and
  * pair generation happens inside the row (O(size²) per basket on a
  * caller-bounded basket size, same volume the textbook self-join
  * carries, minus the join). Item supports and the basket total derive
  * from the same basket frame. The only floats are the three reported
  * ratios, each a single fixed-order division over exact integer
  * counts.
  */
object Association {

  /** Per-basket sorted distinct item arrays — the single-shuffle base
    * frame both miners share. */
  private def basketArrays(df: DataFrame, basketCol: String,
      itemCol: String): DataFrame =
    df.select(col(basketCol).as("g"), col(itemCol).as("item"))
      .filter(col("g").isNotNull)
      .groupBy("g").agg(sort_array(collect_set(col("item"))).as("it"))

  /** All canonical (a < b) item pairs of one basket row, generated
    * in-row from the sorted array. */
  private def pairExpr =
    explode(flatten(transform(col("it"), (x, i) =>
      transform(slice(col("it"), i + lit(2), size(col("it"))),
        y => struct(x.as("a"), y.as("b"))))))

  /** One row per canonical pair (a < b): basket supports `s_a`, `s_b`,
    * `s_ab`, confidences `conf_ab` = s_ab/s_a and `conf_ba` = s_ab/s_b,
    * and `lift` = n·s_ab / (s_a·s_b) (all 6 dp).
    */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minShared: Long): DataFrame = {
    val baskets = basketArrays(df, basketCol, itemCol).persist()
    val pairSup = baskets.select(pairExpr.as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
      .where(col("s_ab") >= minShared)
    val itemSup = baskets.select(explode(col("it")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("s"))
    val total = baskets.agg(count(lit(1)).as("n_baskets"))
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
    * Scale shape: ONE shuffle on the basket key builds per-basket
    * sorted distinct item arrays; every pair and triple is then
    * generated INSIDE the row (array combinatorics, no self-join, so
    * the fact frame is never rescanned and nothing shuffles on the
    * basket key again). The Apriori prune survives: triples are only
    * expanded for pairs whose (a,b) prefix cleared `minShared`, via a
    * semi-join against the qualifying-pair set (≤ |items|² rows by
    * construction; no forced broadcast — item alphabets can be
    * catalog-sized, so AQE picks the strategy). Item supports and the basket total are
    * derived from the same persisted basket frame. Per-row cost is
    * C(k,2) structs on a caller-bounded basket alphabet; the
    * distinct-item alphabet bounds the output (≤ |items|³/6 rows).
    */
  def tripleRules(df: DataFrame, basketCol: String, itemCol: String,
      minShared: Long): DataFrame = {
    val baskets = basketArrays(df, basketCol, itemCol).persist()
    val pairs = baskets.select(col("it"), pairExpr.as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("it"))
    val prefix = pairs.groupBy("a", "b").agg(count(lit(1)).as("s_ab"))
      .where(col("s_ab") >= minShared).select(col("a"), col("b"))
    val tripleSup = pairs
      .join(prefix, Seq("a", "b"), "left_semi")
      .select(col("a"), col("b"),
        explode(filter(col("it"), c => c > col("b"))).as("c"))
      .groupBy("a", "b", "c").agg(count(lit(1)).as("s_abc"))
      .where(col("s_abc") >= minShared)
    val itemSup = baskets.select(explode(col("it")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("s"))
    val total = baskets.agg(count(lit(1)).as("n_baskets"))
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
