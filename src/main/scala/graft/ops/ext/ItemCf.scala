package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: like [[graft.ops.Graph.coOccurrencePairCounts]] —
  * ONE shuffle on the basket key builds per-basket sorted distinct
  * item arrays (collect_set doubles as the distinct), canonical pairs
  * explode inside the row (O(basket²) PER BASKET — order line counts,
  * not corpus size — and never transiting a join), and item counts
  * derive from the same persisted basket frame. The co-count frame
  * shrinks to pairs seen ≥ `minCo` times before the window ranks it,
  * and the rank window partitions by item — parallel, never a global
  * sort.
  */
object ItemCf {

  /** Top-`k` neighbors per item. `df` columns: `basketCol`,
    * `itemCol`. Output: (item, rank, neighbor, co, sim). */
  def topNeighbors(df: DataFrame, basketCol: String, itemCol: String,
                   k: Int, minCo: Long = 2L): DataFrame = {
    val baskets = df.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .filter(col("bk").isNotNull)
      .groupBy("bk").agg(sort_array(collect_set(col("item"))).as("it"))
      .persist()
    val itemCnt = baskets.select(explode(col("it")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("ci"))
    val co = baskets
      .select(explode(flatten(transform(col("it"), (x, idx) =>
        transform(slice(col("it"), idx + lit(2), size(col("it"))),
          y => struct(x.as("i"), y.as("j")))))).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("co"))
      .filter(col("co") >= minCo)
    val sym = co.unionByName(
      co.select(col("j").as("i"), col("i").as("j"), col("co")))
    val scored = sym
      .join(itemCnt.select(col("item").as("i"), col("ci")), "i")
      .join(itemCnt.select(col("item").as("j"), col("ci").as("cj")), "j")
      .select(col("i").as("item"), col("j").as("neighbor"), col("co"),
        round(col("co").cast("double") /
          sqrt((col("ci") * col("cj")).cast("double")), 6).as("sim"))
    val w = Window.partitionBy("item")
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
