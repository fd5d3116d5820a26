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
  * Scale shape: ONE user-hash shuffle of the interaction frame serves
  * the whole list build — hash(user) partitioning satisfies the
  * (user, item) clustering of the pair-count aggregate AND the
  * per-user partitioning of the top-k (rewritten to the heap-based
  * TopKPerGroup operator by the session extension), so the count table
  * never re-shuffles into the ranking (measured at the 10x step:
  * 9.7 s → 5.6 s for the list build). The item attribute joins onto
  * the k-BOUNDED lists (broadcast dimension), never rides the fact
  * shuffle; popularity re-aggregates the count table (its exchange is
  * canonically identical to the list build's input, so AQE reuse runs
  * the fact map stage once); metrics are hash aggregations on the
  * segment key.
  *
  * Deliberately UNPERSISTED everywhere: the multi-consumer subtrees
  * are deduplicated by exchange reuse at runtime; block-cache
  * materialization measured SLOWER than the reuse at the 10x step
  * (~22-24 s persisting the count table vs ~11-17 s pipelined, round-7
  * record).
  */
object RecMetrics {

  /** Top-`k` items per user by (interaction count desc, item asc).
    * `inter`: (user, item, attr); `segments`: (user, seg). Output per
    * segment: n_users, n_rec_items (distinct items recommended),
    * coverage (n_rec_items / catalog size), mean_diversity (mean of
    * per-list distinct-attr ratio), mean_popularity (mean percentile
    * of recommended items, 1 = most popular).
    *
    * This 3-column form carries `attr` through the pair aggregation
    * (min per pair). When the attribute is a FUNCTION OF THE ITEM
    * (brand, category — the common case), use the 4-arg overload: the
    * attribute then joins onto the k-bounded lists instead of riding
    * the fact shuffle.
    */
  def listMetrics(inter: DataFrame, segments: DataFrame, k: Int)
      : DataFrame = {
    val counts = inter.repartition(col("user")).groupBy("user", "item")
      .agg(count(lit(1)).as("cnt"), min("attr").as("attr"))
    val w = Window.partitionBy("user")
      .orderBy(col("cnt").desc, col("item"))
    val recs = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    listMetricsOver(counts, recs, segments)
  }

  /** [[listMetrics]] with the item attribute as a separate dimension
    * `itemAttrs` (item, attr) — joined broadcast onto the k-bounded
    * rec lists, so the fact shuffle carries only (user, item).
    */
  def listMetrics(inter: DataFrame, segments: DataFrame, k: Int,
      itemAttrs: DataFrame): DataFrame = {
    val counts = inter.repartition(col("user")).groupBy("user", "item")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user")
      .orderBy(col("cnt").desc, col("item"))
    val recs = counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(broadcast(itemAttrs), "item")
    listMetricsOver(counts, recs, segments)
  }

  /** Shared metric fold over the count table and the k-bounded,
    * attribute-carrying rec lists.
    */
  private def listMetricsOver(counts: DataFrame, recs: DataFrame,
      segments: DataFrame): DataFrame = {
    val popw = Window.orderBy(col("pcnt").desc, col("item"))
    // popularity from the (user, item) count table, NOT a second pass
    // over the interaction frame: Σ_user cnt ≡ the per-item
    // interaction count, and the counts exchange is canonically
    // identical to the one under the rec lists — AQE's exchange reuse
    // then runs the fact map stage ONCE for the whole query
    val pop = counts.groupBy("item").agg(sum("cnt").as("pcnt"))
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

  /** The p^(d−1) weight table for [[rbo]], built by repeated
    * multiplication (NOT pow()): the same Scala doubles feed both the
    * Spark plan and the builder-authored oracle literals, so no libm
    * pow discrepancy can enter. */
  def rboWeights(p: Double, k: Int): Array[Double] =
    Array.iterate(1.0, k)(_ * p)

  /** Truncated rank-biased overlap (Webber et al. 2010) between two
    * rankings `a` and `b` (columns: item, rank ∈ 1..k):
    * RBO@k = (1−p) Σ_{d=1..k} p^(d−1) · X_d / d, where X_d is the
    * overlap of the two depth-d prefixes. An item in both lists enters
    * every depth d ≥ max(ra, rb), so X_d is one cumulative count over
    * the max-rank histogram — a k-row window, never a pairwise scan.
    * Per-depth terms quantize to 1e-9 before the sum. Output one row:
    * k, overlap_at_k, rbo (6 dp).
    */
  def rbo(a: DataFrame, b: DataFrame, k: Int, p: Double): DataFrame = {
    require(k >= 1 && p > 0 && p < 1)
    val spark = a.sparkSession
    val w = rboWeights(p, k)
    val matched = a.select(col("item"), col("rank").as("ra"))
      .join(b.select(col("item"), col("rank").as("rb")), "item")
      .select(greatest(col("ra"), col("rb")).as("mr"))
      .groupBy("mr").agg(count(lit(1)).as("c"))
    val depths = spark.range(1, k + 1L).select(col("id").as("d"))
    val wmap = map(w.zipWithIndex.flatMap { case (v, i) =>
      Seq(lit(i + 1L), lit(v)) }: _*)
    val cum = depths.join(matched, col("mr") <= col("d"), "left")
      .groupBy("d").agg(coalesce(sum(col("c")), lit(0L)).as("xd"))
      .withColumn("term", element_at(wmap, col("d"))
        * col("xd").cast("double") / col("d").cast("double"))
    cum.agg(
        max(when(col("d") === k, col("xd"))).as("overlap_at_k"),
        sum(floor(col("term") * lit(1e9) + lit(0.5)).cast("long"))
          .as("tq"))
      .select(lit(k.toLong).as("k"), col("overlap_at_k"),
        round((col("tq").cast("double") / lit(1e9)) * lit(1.0 - p), 6)
          .as("rbo"))
  }
}
