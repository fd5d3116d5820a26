package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recommendation-list quality beyond rank accuracy (q133 covers
  * NDCG/MRR): catalog coverage, intra-list attribute diversity, and
  * popularity bias — the metrics that catch a recommender collapsing
  * onto the head of the catalog even while its NDCG looks fine.
  *
  * Determinism: list construction tie-breaks by item id; per-user
  * diversity ratios and per-item popularity percentiles quantize to
  * 1e-6 fixed point before any cross-row mean.
  *
  * Scale shape: list construction is a per-user rank window
  * (rewritten to the heap-based TopKPerGroup operator by the session
  * extension); the popularity frame is one row per item, broadcast;
  * metrics are hash aggregations on the segment key.
  */
object RecMetrics {

  /** Top-`k` items per user by (interaction count desc, item asc).
    * `inter`: (user, item, attr); `segments`: (user, seg). Output per
    * segment: n_users, n_rec_items (distinct items recommended),
    * coverage (n_rec_items / catalog size), mean_diversity (mean of
    * per-list distinct-attr ratio), mean_popularity (mean percentile
    * of recommended items, 1 = most popular).
    */
  def listMetrics(inter: DataFrame, segments: DataFrame, k: Int)
      : DataFrame = {
    val counts = inter.groupBy("user", "item")
      .agg(count(lit(1)).as("cnt"), min("attr").as("attr"))
    val w = Window.partitionBy("user")
      .orderBy(col("cnt").desc, col("item"))
    val recs = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val popw = Window.orderBy(col("pcnt").desc, col("item"))
    val pop = inter.groupBy("item").agg(count(lit(1)).as("pcnt"))
    val nItems = pop.agg(count(lit(1)).as("n_items"))
    val popRank = pop.withColumn("prank", row_number().over(popw))
      .crossJoin(broadcast(nItems))
      .select(col("item"),
        floor((lit(1.0) - (col("prank") - 1).cast("double")
          / col("n_items").cast("double")) * 1000000.0 + 0.5)
          .cast("long").as("popq"))
    val perUser = recs.join(broadcast(popRank), "item")
      .groupBy("user")
      .agg(count(lit(1)).as("list_n"),
        countDistinct("attr").as("n_attrs"),
        sum("popq").as("spopq"))
      .select(col("user"), col("list_n"),
        floor(col("n_attrs").cast("double") / col("list_n").cast("double")
          * 1000000.0 + 0.5).cast("long").as("divq"),
        col("spopq"))
    val segUser = perUser.join(segments, "user")
      .groupBy("seg")
      .agg(count(lit(1)).as("n_users"),
        sum("divq").as("sdivq"),
        sum("spopq").as("spq"), sum("list_n").as("n_rows"))
    val segItems = recs.join(segments, "user")
      .groupBy("seg").agg(countDistinct("item").as("n_rec_items"))
    segUser.join(segItems, "seg").crossJoin(broadcast(nItems))
      .select(col("seg"), col("n_users"), col("n_rec_items"),
        round(col("n_rec_items").cast("double")
          / col("n_items").cast("double"), 6).as("coverage"),
        round(col("sdivq").cast("double") / 1000000.0
          / col("n_users").cast("double"), 6).as("mean_diversity"),
        round(col("spq").cast("double") / 1000000.0
          / col("n_rows").cast("double"), 6).as("mean_popularity"))
  }
}
