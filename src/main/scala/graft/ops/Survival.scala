package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over right-censored durations
  * (user lifetimes, document retention, job runtimes).
  *
  * Scale shape: the corpus-sized work is ONE hash aggregation keyed by
  * the distinct duration — everything after runs on the per-time
  * summary, whose cardinality is bounded by the duration domain (days
  * in a window, not rows in the corpus). The global window and the
  * single collected step array live on that bounded summary only, the
  * same contract as the histogram/quantile summaries.
  *
  * Determinism: death/censor/at-risk counts are exact integers; the
  * survival curve is a sequential product of (1 − dᵢ/nᵢ) doubles
  * folded in time order from an explicit 1.0 init — the one float
  * computation, replayed op-for-op by the oracle's list fold (each
  * prefix re-folded from scratch, O(k²) on the bounded k).
  */
object Survival {

  /** The estimator: one output row per distinct duration with the
    * at-risk count `n_risk`, deaths `d` (observed = true leavers),
    * censored `c`, and `survival` = Π_{u≤t} (1 − d_u/n_u), 6 dp.
    * Deaths at t precede censoring at t (the standard convention —
    * both leave the risk set only for times > t).
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
                  observedCol: String): DataFrame = {
    val perT = df.groupBy(col(durationCol).as("t"))
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val total = df.agg(count(lit(1)).as("n_total"))
    val cumPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = perT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("leave")).over(cumPrev), lit(0L)))
      .select(col("t"), col("n_risk"), col("d"),
        (col("leave") - col("d")).as("c"))
    // bounded per-time summary -> one ordered step array; survival at
    // step i re-folds the factor prefix so every prefix product is the
    // same left-to-right double sequence on both engines
    val steps = risk.agg(sort_array(collect_list(
      struct(col("t"), col("n_risk"), col("d"), col("c")))).as("__a"))
    val factors = transform(col("__a"),
      e => lit(1.0) - e.getField("d").cast("double") / e.getField("n_risk"))
    def prefixProd(i: Column): Column =
      aggregate(slice(factors, lit(1), i), lit(1.0), (acc, f) => acc * f)
    steps
      .select(explode(transform(sequence(lit(1), size(col("__a"))),
        i => struct(element_at(col("__a"), i).as("e"),
          round(prefixProd(i), 6).as("survival")))).as("r"))
      .select(col("r.e.t").as(durationCol), col("r.e.n_risk").as("n_risk"),
        col("r.e.d").as("d"), col("r.e.c").as("c"), col("r.survival"))
  }
}
