package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering on co-occurrence counts: two
  * items' similarity is cos(i,j) = c_ij / √(c_i·c_j) where c_ij
  * counts baskets containing both — the classic neighborhood
  * recommender (Sarwar et al., WWW 2001), and the workhorse for
  * "parts bought together" style retrieval over transaction logs.
  *
  * Determinism: every count is an exact integer from hash
  * aggregations; the cosine is one sqrt over exact operands, rounded
  * to 6 dp, and the per-item top-k tie-breaks (sim DESC, then
  * neighbor id ASC) — bit-stable on any engine.
  *
  * Scale shape (reworked round 9 — q255 was the worst sf1 scaler):
  * the basket-array build (`collect_set` per basket) was the dominant
  * stage — an ObjectHashAggregate outside whole-stage codegen moving
  * row-scale data through object buffers. The pipeline now stays
  * codegen'd end to end: DISTINCT (bk, item) pairs (one hash
  * aggregation), a self equi-join on the basket key emitting canonical
  * `i < j` pairs (hash join, O(basket²) rows PER BASKET — order line
  * counts, not corpus size), one (i, j) count aggregation, and
  * map-side scoring joins against the broadcast item-count dim (the
  * catalog is orders of magnitude smaller than the pair frame —
  * [[MaxBroadcastItems]] gates the hint on a MEASURED count). The
  * co-count frame shrinks to pairs seen ≥ `minCo` times before
  * ranking, and the per-item rank goes through the partial-top-k
  * operator (`GraftTopKRule` rewrites the rank-filter window), so only
  * per-partition survivors shuffle.
  */
object ItemCf {

  /** Item-count frames up to this many rows are broadcast into the
    * pair-scoring joins (~16 B/row → ≤128 MB serialized): shipping
    * the catalog to every executor deletes two shuffles of the pair
    * frame. Beyond it (a 100M-item catalog would be ~1.6 GB) the hint
    * is withheld and AQE picks the join strategy.
    */
  private val MaxBroadcastItems = 8000000L

  /** Top-`k` neighbors per item. `df` columns: `basketCol`,
    * `itemCol`. Output: (item, rank, neighbor, co, sim). */
  def topNeighbors(df: DataFrame, basketCol: String, itemCol: String,
                   k: Int, minCo: Long = 2L): DataFrame = {
    // distinct membership pairs: the one frame everything derives from
    // (persisted — read back by the counts, both join sides, nothing
    // recomputes the upstream scan). The ONE row-scale exchange hashes
    // on the basket key alone: partitioning by bk satisfies the
    // (bk, item) dedup grouping AND both sides of the self-join, so
    // dedup + join ride a single shuffle instead of three
    val b = df.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .filter(col("bk").isNotNull)
      .repartition(col("bk"))
      .groupBy("bk", "item").agg(count(lit(1)).as("__m")).drop("__m")
      .persist()
    val itemCnt = b.groupBy("item").agg(count(lit(1)).as("ci")).persist()
    val dim =
      if (itemCnt.count() <= MaxBroadcastItems) broadcast(itemCnt)
      else itemCnt
    // canonical co-occurrence pairs from the self equi-join on the
    // basket key — codegen'd hash join + hash agg, no object buffers
    val co = b.as("a").join(b.as("b2"),
        col("a.bk") === col("b2.bk") && col("a.item") < col("b2.item"))
      .select(col("a.item").as("i"), col("b2.item").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    // score the CANONICAL pair (half the join input), then emit both
    // directions; with the broadcast dim the lookups are map-side, so
    // the pair frame is never re-shuffled between its groupBy and the
    // per-item rank
    val scoredHalf = co
      .join(dim.select(col("item").as("i"), col("ci")), "i")
      .join(dim.select(col("item").as("j"), col("ci").as("cj")), "j")
      .withColumn("sim", round(col("co").cast("double") /
        sqrt((col("ci") * col("cj")).cast("double")), 6))
    val scored = scoredHalf
      .select(col("i").as("item"), col("j").as("neighbor"), col("co"),
        col("sim"))
      .unionByName(scoredHalf.select(col("j").as("item"),
        col("i").as("neighbor"), col("co"), col("sim")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("item")
      .orderBy(col("sim").desc, col("neighbor"))
    // rank as long, matching the sibling window ops (esSample et al.)
    // and the BIGINT the oracle emits — no type drift for the compare
    // layer to paper over
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("neighbor"), col("co"),
        col("sim"))
  }
}
