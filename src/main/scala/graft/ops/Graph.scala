package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in INTEGER-SCALED arithmetic: ranks are
  * longs scaled by 1e12; a node's contribution is `rank div outdeg`
  * and the damping update is `0.15*scale/n + (85 * sum) div 100` —
  * every step exact integer math, so the result is bit-identical
  * across engines, partitionings and retries (double-based PageRank
  * differs in the last ulps with summation order). Truncation loss per
  * step is < outdeg ulps of 1e-12 — noise relative to rank mass.
  *
  * Each iteration is one broadcast-sized join (outdeg), one join of
  * edges to ranks on src (both sides hash-partitioned on src — AQE
  * reuses the layout across iterations) and one groupBy dst: the
  * standard two-shuffle PageRank round. Dangling mass is dropped (the
  * simple-PageRank convention), so ranks sum to < scale.
  *
  * `iterations` is deliberately a parameter, not a convergence loop:
  * training-data graph jobs (dedup-cluster authority, citation rank)
  * run a fixed small number of rounds; unbounded driver loops over
  * 100 TB graphs belong to a checkpointed driver program like the
  * connected-components operator's.
  */
object Graph {
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 50)
    val e = edges.select(col("src"), col("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val n = nodes.count()
    val base = 15L * scale / 100 / n
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("sum_c"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("85 * coalesce(sum_c, 0L) div 100")).as("rank"))
    }
    ranks
  }
}
