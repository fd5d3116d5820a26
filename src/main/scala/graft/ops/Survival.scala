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

  /** Two-group log-rank test: at each distinct event time t with
    * d_t > 0 total deaths, the group-1 expectation e_t = d_t·n1_t/n_t
    * and hypergeometric variance v_t = d_t·(n1_t/n_t)·(n2_t/n_t)·
    * (n_t−d_t)/(n_t−1); χ² = (O₁−E₁)²/V. Same scale shape as
    * [[kaplanMeier]]: one corpus-sized hash aggregation to the distinct
    * duration domain, then the at-risk prefix windows and the term
    * algebra run on that bounded summary. Counts are exact integers;
    * d_t·n1_t ≤ n² stays exactly representable, so each per-time term
    * is a fixed chain of IEEE ops on exact operands — identical on any
    * engine — and the cross-time SUMS quantize each term to 1e-9 longs
    * first (the q245 rule: never sum raw doubles across rows). Output
    * one row: `o_1`, `o_2`, `e_1`, `e_2`, `v` (6 dp), `chi2` (6 dp).
    */
  def logRank(df: DataFrame, durationCol: String, observedCol: String,
              groupCol: String, a: String, b: String): DataFrame = {
    val perT = df.filter(col(groupCol).isin(a, b))
      .groupBy(col(durationCol).as("t"))
      .agg(
        sum(when(col(groupCol) === a && col(observedCol), 1L).otherwise(0L))
          .as("d1"),
        sum(when(col(groupCol) === b && col(observedCol), 1L).otherwise(0L))
          .as("d2"),
        sum(when(col(groupCol) === a, 1L).otherwise(0L)).as("l1"),
        sum(when(col(groupCol) === b, 1L).otherwise(0L)).as("l2"))
    val tot = perT.agg(sum(col("l1")).as("t1"), sum(col("l2")).as("t2"))
    val cumPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = perT.crossJoin(broadcast(tot))
      .withColumn("n1",
        col("t1") - coalesce(sum(col("l1")).over(cumPrev), lit(0L)))
      .withColumn("n2",
        col("t2") - coalesce(sum(col("l2")).over(cumPrev), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("nt", col("n1") + col("n2"))
      .filter(col("d") > 0 && col("nt") > 0)
    // e_t = d·n1/nt as ONE division over the exact long product;
    // v_t chains three such divisions — the same textual expression
    // the oracle evaluates, then both quantize to 1e-9 before summing
    val e1 = (col("d") * col("n1")).cast("double") / col("nt").cast("double")
    val v = when(col("nt") > 1,
      e1 * (col("n2").cast("double") / col("nt").cast("double"))
        * ((col("nt") - col("d")).cast("double")
          / (col("nt") - lit(1)).cast("double"))).otherwise(lit(0.0))
    val agg = risk.agg(
      sum(col("d1")).as("o_1"), sum(col("d2")).as("o_2"),
      sum(floor(e1 * lit(1e9) + lit(0.5)).cast("long")).as("eq"),
      sum(floor(v * lit(1e9) + lit(0.5)).cast("long")).as("vq"))
    agg.select(col("o_1"), col("o_2"),
        (col("eq").cast("double") / lit(1e9)).as("e1d"),
        ((col("o_1") + col("o_2")).cast("double")
          - col("eq").cast("double") / lit(1e9)).as("e2d"),
        (col("vq").cast("double") / lit(1e9)).as("vd"))
      .select(col("o_1"), col("o_2"),
        round(col("e1d"), 6).as("e_1"), round(col("e2d"), 6).as("e_2"),
        round(col("vd"), 6).as("v"),
        round((col("o_1").cast("double") - col("e1d"))
          * (col("o_1").cast("double") - col("e1d")) / col("vd"), 6)
          .as("chi2"))
  }
}
