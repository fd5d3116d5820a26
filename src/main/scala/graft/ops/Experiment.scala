package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-analysis estimators over per-unit metrics: CUPED
  * variance reduction and difference-in-differences — the A/B
  * readout layer that sits downstream of sessionization (q55) and
  * the funnel/attribution queries.
  *
  * Everything reduces to exact integer moment sums over pre-quantized
  * per-unit metrics (the caller quantizes values to fixed point), so
  * the estimators are order-free under distributed aggregation; the
  * handful of closing float ops (the theta ratio, the adjusted means)
  * are written in one fixed shape that a SQL oracle replays verbatim.
  *
  * Scale shape: one hash aggregation per unit (map-side partials),
  * then a single global aggregation of the 5 moment sums — a
  * scalar frame that broadcasts back onto the per-arm rollup. No
  * windows, no sorts, no driver-side math beyond plan construction.
  */
object Experiment {

  /** CUPED ([[https://exp-platform.com/cuped]] Deng et al., WSDM'13):
    * per-unit post-period metric `y` adjusted by the pre-period
    * covariate `x`, `y' = y − θ(x − x̄)` with
    * `θ = cov(x,y)/var(x)` pooled across arms.
    *
    * Input: one row per unit with exact integer columns `x`, `y`
    * (fixed-point, scale `scale`) and a grouping column `armCol`.
    * Output per arm: n, raw mean, CUPED-adjusted mean, θ, and the
    * pooled variance-reduction ratio 1 − var(y−θx)/var(y).
    *
    * Integer-overflow envelope: |x|,|y| ≤ ~2e9 and n ≤ ~1e9 keeps
    * n·Σxy inside a Long; past that, lift the moment sums to
    * DECIMAL(38,0) — same plan shape, wider partials.
    */
  def cuped(units: DataFrame, armCol: String, scale: Double): DataFrame = {
    val moments = units.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val g = moments.select(col("n"), col("sx"), col("sy"),
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("theta"),
      col("sxy"), col("sxx"), col("syy"))
    val arms = units.groupBy(col(armCol))
      .agg(count(lit(1)).as("na"), sum("x").as("sxa"), sum("y").as("sya"))
    arms.crossJoin(broadcast(g)).select(
      col(armCol),
      col("na").as("n_units"),
      round(col("sya").cast("double") / col("na").cast("double") / scale, 6)
        .as("mean_raw"),
      round((col("sya").cast("double") / col("na").cast("double") -
        col("theta") * (col("sxa").cast("double") / col("na").cast("double")
          - col("sx").cast("double") / col("n").cast("double"))) / scale, 6)
        .as("mean_cuped"),
      round(col("theta"), 6).as("theta"),
      round(lit(1.0) -
        ((col("syy").cast("double")
            - lit(2.0) * col("theta") * col("sxy").cast("double")
            + col("theta") * col("theta") * col("sxx").cast("double"))
          / col("n").cast("double")
          - (col("sy").cast("double") / col("n").cast("double")
              - col("theta") * col("sx").cast("double") / col("n").cast("double"))
            * (col("sy").cast("double") / col("n").cast("double")
              - col("theta") * col("sx").cast("double") / col("n").cast("double")))
        / (col("syy").cast("double") / col("n").cast("double")
          - col("sy").cast("double") / col("n").cast("double")
            * col("sy").cast("double") / col("n").cast("double")), 6)
        .as("var_reduction"))
  }

  /** Stratified (blocked) average-treatment-effect estimate: units
    * stratify on a pre-treatment covariate via rank quantiles
    * (deterministic tie-break on the unit id — no model, no libm),
    * and the ATE is the stratum-size-weighted mean of within-stratum
    * arm differences — the IPW/propensity-stratification readout for
    * non-randomized arms. Each stratum term quantizes to 1e-9 before
    * the cross-stratum sum.
    *
    * Input: one row per unit with integer `x` (covariate), `y`
    * (metric, fixed point at `scale`), boolean `treated`, and a
    * unique `unit` id. Output per stratum: counts, arm means, the
    * within-stratum difference, and the pooled ATE (repeated).
    *
    * The ntile window is a single global sort — fine for unit-level
    * frames (one row per experiment unit); at extreme unit counts
    * swap for approx-quantile stratum edges, same downstream shape.
    */
  def stratifiedAte(units: DataFrame, nStrata: Int,
      scale: Double): DataFrame = {
    val w = Window.orderBy(col("x"), col("unit"))
    val st = units.withColumn("stratum",
      ntile(nStrata).over(w).cast("long"))
    val arms = st.groupBy(col("stratum"), col("treated"))
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val t = arms.filter(col("treated"))
      .select(col("stratum"), col("n").as("n_treat"),
        col("sy").as("sy_t"))
    val c = arms.filter(!col("treated"))
      .select(col("stratum"), col("n").as("n_ctrl"),
        col("sy").as("sy_c"))
    val joined = t.join(c, "stratum")
      .withColumn("diff",
        (col("sy_t").cast("double") / col("n_treat").cast("double")
          - col("sy_c").cast("double") / col("n_ctrl").cast("double"))
          / scale)
    val tot = joined.agg(sum(col("n_treat") + col("n_ctrl")).as("nn"))
    val withAte = joined.crossJoin(broadcast(tot))
      .withColumn("tq",
        floor((col("n_treat") + col("n_ctrl")).cast("double")
          / col("nn").cast("double") * col("diff") * 1000000000.0 + 0.5)
          .cast("long"))
    val ate = withAte.agg(sum("tq").as("sq"))
    withAte.crossJoin(broadcast(ate))
      .select(col("stratum"), col("n_treat"), col("n_ctrl"),
        round(col("sy_t").cast("double") / col("n_treat").cast("double")
          / scale, 6).as("mean_treat"),
        round(col("sy_c").cast("double") / col("n_ctrl").cast("double")
          / scale, 6).as("mean_ctrl"),
        round(col("diff"), 6).as("diff"),
        round(col("sq").cast("double") / 1000000000.0, 6).as("ate"))
  }

  /** Difference-in-differences over per-unit pre/post means: the
    * (treated, post) interaction effect
    * `(ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)` from exact
    * integer cell sums. Input: one row per (unit, period) with
    * integer `y`, boolean-ish `treated` and `post` columns. Output:
    * one row per cell plus the DiD estimate repeated (scalar
    * broadcast), all means at fixed-point `scale`.
    */
  def diffInDiff(cells: DataFrame, scale: Double): DataFrame = {
    val agg = cells.groupBy(col("treated"), col("post"))
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
      .withColumn("mean_y",
        col("sy").cast("double") / col("n").cast("double") / scale)
    val wide = agg.groupBy()
      .pivot(concat(when(col("treated"), lit("t")).otherwise(lit("c")),
        when(col("post"), lit("_post")).otherwise(lit("_pre"))),
        Seq("t_post", "t_pre", "c_post", "c_pre"))
      .agg(first("mean_y"))
    agg.crossJoin(broadcast(wide.select(
      ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
        .as("did"))))
      .select(col("treated"), col("post"), col("n"),
        round(col("mean_y"), 6).as("mean_y"), round(col("did"), 6).as("did"))
  }

  /** Quantile treatment effects: the difference of EXACT per-arm
    * order statistics at each requested quantile — where in the
    * outcome distribution the treatment moves mass, which the mean
    * effect (CUPED q231 / stratified ATE q245) averages away. Both
    * arms' quantiles walk the integer value domain with the
    * ⌈q·n⌉ = (num·n+den−1) div den rank (the exact-percentile house
    * rule); QTE is one integer subtraction per quantile. `valueCol`
    * must be integral (caller quantizes). Output per quantile:
    * q_num, q_den, treat_q, control_q, qte.
    */
  def quantileTreatmentEffects(df: DataFrame, armCol: String,
      valueCol: String, quantiles: Seq[(Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dom = df.select(col(armCol).as("t"), col(valueCol).as("v"))
      .groupBy("t", "v").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("t").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dom.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("t")))
      .persist()
    val frames = quantiles.map { case (num, den) =>
      val q = cum
        .filter(col("cum") >= expr(s"($num * n + $den - 1) div $den"))
        .groupBy("t").agg(min(col("v")).as("qv"))
      val tq = q.filter(col("t")).select(col("qv").as("treat_q"))
      val cq = q.filter(!col("t")).select(col("qv").as("control_q"))
      tq.crossJoin(cq).select(
        lit(num.toLong).as("q_num"), lit(den.toLong).as("q_den"),
        col("treat_q"), col("control_q"),
        (col("treat_q") - col("control_q")).as("qte"))
    }
    frames.reduce(_ unionByName _)
  }

  /** p-chart (attribute control chart): per period, the success
    * proportion with 3σ binomial control limits around the pooled
    * p̄ — LCL/UCL = p̄ ∓ 3·√(p̄(1−p̄)/n_t), clamped to [0,1] — and the
    * out-of-control flag. The SPC companion to the sequential SPRT
    * (q212): SPRT decides one hypothesis; the p-chart monitors every
    * period against common-cause variation. Counts are exact integers
    * from one aggregation; p̄ broadcast; each limit is a fixed IEEE
    * chain. The flag compares the UNROUNDED p against the limits.
    * Output per period: n, x, p, lcl, ucl (6 dp), out_of_control.
    */
  def pChart(df: DataFrame, periodCol: String, successCol: String)
      : DataFrame = {
    val per = df.groupBy(col(periodCol).as("t"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("x"))
    val pooled = per.agg(sum(col("x")).as("sx"), sum(col("n")).as("sn"))
      .select((col("sx").cast("double") / col("sn").cast("double"))
        .as("pbar"))
    val p = col("x").cast("double") / col("n").cast("double")
    val half = lit(3.0) * sqrt(col("pbar") * (lit(1.0) - col("pbar"))
      / col("n").cast("double"))
    per.crossJoin(broadcast(pooled))
      .select(col("t").as(periodCol), col("n"), col("x"),
        round(p, 6).as("p"),
        round(greatest(col("pbar") - half, lit(0.0)), 6).as("lcl"),
        round(least(col("pbar") + half, lit(1.0)), 6).as("ucl"),
        (p < greatest(col("pbar") - half, lit(0.0))
          || p > least(col("pbar") + half, lit(1.0)))
          .as("out_of_control"))
  }

  /** McNemar's test for paired binary outcomes (one row per unit with
    * boolean `aCol`/`bCol`): only the discordant cells inform the
    * test — χ² = (b₀₁−b₁₀)²/(b₀₁+b₁₀), plus the continuity-corrected
    * (|b₀₁−b₁₀|−1)²/(b₀₁+b₁₀). One map-side-combining aggregation
    * over the unit frame; all counts exact integers, the two closing
    * ratios the only float work. Output one row: `n`, `b01` (a∧¬b),
    * `b10` (¬a∧b), `chi2`, `chi2_cc` (6 dp, null when no discordant
    * pairs).
    */
  def mcnemar(units: DataFrame, aCol: String, bCol: String): DataFrame = {
    val agg = units.agg(
      count(lit(1)).as("n"),
      sum(when(col(aCol) && !col(bCol), 1L).otherwise(0L)).as("b01"),
      sum(when(!col(aCol) && col(bCol), 1L).otherwise(0L)).as("b10"))
    agg.select(col("n"), col("b01"), col("b10"),
      round((col("b01") - col("b10")).cast("double")
        * (col("b01") - col("b10")).cast("double")
        / (col("b01") + col("b10")).cast("double"), 6).as("chi2"),
      round((abs(col("b01") - col("b10")) - lit(1)).cast("double")
        * (abs(col("b01") - col("b10")) - lit(1)).cast("double")
        / (col("b01") + col("b10")).cast("double"), 6).as("chi2_cc"))
  }
}
