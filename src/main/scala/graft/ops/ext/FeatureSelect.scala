package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy mRMR feature selection (max-relevance, min-redundancy —
  * Peng et al., TPAMI 2005) over categorical features: pick the
  * feature with the highest mutual information against the target,
  * then repeatedly add the feature maximizing
  * `MI(f, y) − mean_{s ∈ selected} MI(f, s)` — relevance minus
  * redundancy — so correlated near-duplicates of an already-selected
  * feature lose to genuinely new signal.
  *
  * All 15-ish pairwise MI values come from ONE generic computation
  * over the melted (row, feature, value) frame: a self-join on the
  * row id grouped to (feature-pair, value-pair) cells, each cell's
  * `p·ln(p/(pₐ·p_b))` term quantized to 1e-9 before the per-pair sum.
  * The greedy rounds then run on a features²-sized frame — driver-free
  * joins over a handful of rows.
  *
  * Scale shape: the only corpus-sized operations are the melt and the
  * row-id self-join (one shuffle on the row id, fan-out = features²
  * per row — features are a handful by design). Everything downstream
  * is alphabet-sized.
  */
object FeatureSelect {

  /** Symmetric pairwise MI table (fa, fb, mi) in nats, both
    * directions, from `long`: (row_id, feature, value).
    */
  def pairwiseMi(long: DataFrame): DataFrame = {
    val n = long.select(col("row_id")).distinct().count()
    val marg = long.groupBy("feature", "value")
      .agg(count(lit(1)).as("c"))
    val cells = long.select(col("row_id"), col("feature").as("fa"),
        col("value").as("va"))
      .join(long.select(col("row_id"), col("feature").as("fb"),
        col("value").as("vb")), "row_id")
      .filter(col("fa") < col("fb"))
      .groupBy("fa", "fb", "va", "vb").agg(count(lit(1)).as("c"))
    val mi = cells
      .join(marg.select(col("feature").as("fa"), col("value").as("va"),
        col("c").as("ca")), Seq("fa", "va"))
      .join(marg.select(col("feature").as("fb"), col("value").as("vb"),
        col("c").as("cb")), Seq("fb", "vb"))
      .select(col("fa"), col("fb"),
        floor(col("c").cast("double") / lit(n.toDouble)
          * log(col("c").cast("double") * lit(n.toDouble)
            / (col("ca").cast("double") * col("cb").cast("double")))
          * 1000000000.0 + 0.5).cast("long").as("tq"))
      .groupBy("fa", "fb").agg(sum("tq").as("sq"))
      .select(col("fa"), col("fb"), col("sq"),
        (col("sq").cast("double") / 1000000000.0).as("mi"))
    mi.unionByName(mi.select(col("fb").as("fa"), col("fa").as("fb"),
      col("sq"), col("mi")))
  }

  /** Greedy mRMR: select `k` features against `target` (a feature
    * name present in the melted frame). Output one row per selection
    * round: rank, feature, relevance, redundancy, score.
    */
  def mrmr(long: DataFrame, target: String, k: Int): DataFrame = {
    val mi = pairwiseMi(long).localCheckpoint(true)
    val rel = mi.filter(col("fb") === target)
      .select(col("fa").as("feature"), col("mi").as("rel"))
    var selected = List.empty[String]
    var out: DataFrame = null
    for (r <- 1 to k) {
      val cand = rel.filter(!col("feature").isInCollection(
        target :: selected))
      val scored =
        if (selected.isEmpty)
          cand.select(col("feature"), col("rel"),
            lit(0.0).as("red"), col("rel").as("score"))
        else {
          // redundancy mean rides the 1e-9 integer grid (sum of
          // quantized longs, one division) — order-free at any
          // selected-set size
          val red = mi.filter(col("fb").isInCollection(selected))
            .groupBy(col("fa").as("feature"))
            .agg((sum("sq").cast("double") / 1000000000.0
              / selected.size.toDouble).as("red"))
          cand.join(red, "feature")
            .select(col("feature"), col("rel"), col("red"),
              (col("rel") - col("red")).as("score"))
        }
      val pick = scored.orderBy(col("score").desc, col("feature"))
        .limit(1).withColumn("rank", lit(r.toLong))
        .localCheckpoint(true)
      // 1-row driver pick: the selected-feature list IS the artifact
      // being built (same contract as the BPE merge table in q190) —
      // alphabet-sized by construction, never data-sized
      selected = selected :+
        pick.select("feature").collect().head.getString(0)
      out = if (out == null) pick else out.unionByName(pick)
    }
    out.select(col("rank"), col("feature"), round(col("rel"), 6).as("rel"),
      round(col("red"), 6).as("red"), round(col("score"), 6).as("score"))
  }
}
