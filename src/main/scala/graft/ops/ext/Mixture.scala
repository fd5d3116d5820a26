package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture rebalancing — the data-mixture stage of a training pipeline:
  * given target proportions per stratum (language, source, domain),
  * downsample the corpus to the LARGEST total that satisfies the target
  * mixture exactly, without upsampling any stratum.
  *
  * total  T       = min over strata of floor(count_g / w_g)
  * take_g         = floor(w_g · T)
  * kept per group = the take_g rows with the smallest md5(key) — the
  * same deterministic, engine-portable uniform order the repo's other
  * sampling operators use (Sampling.hashBucket), so the selection is a
  * pure function of the data, reproducible run-to-run and across
  * engines.
  *
  * Scale shape: one tiny aggregate for the per-stratum counts (map-side
  * partial), a broadcast of the (stratum → take) plan back onto the
  * corpus, and one per-stratum window for the hash-rank. The window
  * shuffles by the stratum — at heavy skew (one language = half the
  * corpus) the rank-within-stratum is the same pattern q73's exact
  * stratified sample already uses; for rate-based (inexact) mixing at
  * extreme scale, Sampling.stratifiedSample is the windowless
  * alternative.
  */
object Mixture {

  /** Rebalance `df` to the target mixture `weights` (stratum → target
    * proportion; must cover every stratum present and sum to ≤ 1).
    * Strata not in `weights` are dropped (weight 0).
    */
  def rebalance(df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val wcol = element_at(
      map(weights.toSeq.sortBy(_._1)
        .flatMap { case (k, w) => Seq(lit(k), lit(w)) }: _*),
      col(strataCol))
    val counts = df.groupBy(strataCol).count()
      .withColumn("w", wcol)
      .filter(col("w").isNotNull)
    // T = min_g floor(count_g / w_g): the largest total the scarcest
    // stratum can support at its target share.
    val budget = counts.agg(min(floor(col("count") / col("w"))).as("t"))
    val takes = counts.crossJoin(budget)
      .select(col(strataCol),
        floor(col("w") * col("t")).cast("long").as("take"))
    val rn = row_number().over(Window.partitionBy(strataCol)
      .orderBy(Sampling.hashBucket(col(keyCol)), col(keyCol)))
    df.withColumn("rn", rn)
      .join(broadcast(takes), Seq(strataCol))
      .filter(col("rn") <= col("take"))
      .drop("rn", "take")
  }

  /** Epoch scheduler — the UPSAMPLING counterpart of [[rebalance]]:
    * given target mixture weights and a token budget (a multiplier of
    * the weighted corpus total), compute how many times each stratum
    * must repeat (epoch over its data) to hit its target share, capped
    * at `maxEpochs` (the repetition ceiling the scaling-laws
    * literature imposes before repeated data stops helping).
    * Everything a training-run manifest needs, per stratum:
    *
    *   available    = Σ tokens in the stratum
    *   budget       = floor(budgetMultiplier · Σ_g available_g)
    *   target       = floor(w_g · budget)
    *   planned      = min(target, maxEpochs · available)  — cap binds
    *   full_epochs  = planned div available (integer)
    *   tail_tokens  = planned mod available  (the partial-epoch slice)
    *   repeat_factor= planned / available    (one IEEE division, 6 dp)
    *
    * Pure integer arithmetic until the single rounded division, so the
    * plan is engine-exact. Scale shape: ONE aggregate over the corpus
    * (map-side combined token sums); the plan frame is strata-sized.
    */
  def epochSchedule(df: DataFrame, strataCol: String, tokensCol: String,
      weights: Map[String, Double], budgetMultiplier: Double,
      maxEpochs: Int = 4): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(budgetMultiplier > 0 && maxEpochs >= 1,
      "budgetMultiplier/maxEpochs must be positive")
    val wcol = element_at(
      map(weights.toSeq.sortBy(_._1)
        .flatMap { case (k, w) => Seq(lit(k), lit(w)) }: _*),
      col(strataCol))
    val avail = df.groupBy(strataCol)
      .agg(sum(col(tokensCol)).cast("long").as("available"))
      .withColumn("w", wcol)
      .filter(col("w").isNotNull)
    // budget derives from the weighted corpus total INSIDE the plan (a
    // broadcast 1-row frame) — no driver-side scalar, so the schedule
    // stays a single declarative query at any corpus size
    val tot = avail.agg(sum(col("available")).as("tot"))
    val target =
      floor(col("w") * floor(lit(budgetMultiplier) * col("tot"))).cast("long")
    val planned = least(target, lit(maxEpochs.toLong) * col("available"))
    avail.crossJoin(broadcast(tot))
      .select(col(strataCol), col("available"),
        target.as("target"), planned.as("planned"))
      .withColumn("full_epochs", expr("planned div available"))
      .withColumn("tail_tokens", col("planned") % col("available"))
      .withColumn("repeat_factor",
        round(col("planned").cast("double") / col("available"), 6))
  }
}
