package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multiple-testing / independence statistics — the screening half of
  * an annotation pipeline whose upstream emits per-row p-values
  * (differential-abundance tables carry p.value / p.twosided columns;
  * any screen over thousands of rows needs FDR control before a
  * threshold means anything).
  *
  * Determinism: every input to the float arithmetic is integer-derived
  * (counts, ranks) or an already-pinned double column, operations
  * apply in a fixed documented order, and order-sensitive sums go
  * through DECIMAL — the repo's cross-engine rules.
  */
object Hypothesis {

  /** Benjamini–Hochberg adjusted q-values: with p(1) ≤ … ≤ p(n),
    * q(i) = min(1, min_{j ≥ i} p(j)·n/j). Appends `rank`, `q_value`,
    * and `significant` (q ≤ alpha).
    *
    * Shape: BH is a rank statistic over the TESTED HYPOTHESES. The
    * rank and the right-to-left running min both run TWO-LEVEL
    * ([[ScaleWindows]]): bucket-local windows in parallel + a ≤64-row
    * offset fold — no unpartitioned row-scale window, so the adjust
    * survives a p-value frame the size of the corpus. Ties rank
    * deterministically by `idCol`.
    */
  def bhAdjust(df: DataFrame, pCol: String, idCol: String,
      alpha: Double = 0.05): DataFrame =
    fdrAdjust(df, pCol, idCol, alpha,
      n => n.cast("double"))

  /** Shared BH/BY core: rank p ascending, q = min(1, tail-min of
    * p·factor(n)/rank), significant = q ≤ alpha — with both global
    * scans two-level. `factor` maps the total-count column to the
    * scaling factor (n for BH, n·c(n) for BY).
    */
  private def fdrAdjust(df: DataFrame, pCol: String, idCol: String,
      alpha: Double, factor: Column => Column): DataFrame = {
    // ONE measured count serves three roles: BH's n, and the size hint
    // for both ScaleWindows scans (the gate then skips its own
    // count+persist per call — the round-8 q138 toy-scale regression)
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = p.count()
    val ranked = ScaleWindows
      .globalRowNumber(p, pCol, Seq(idCol), "rank", sizeHint = Some(n))
      .withColumn("__bhterm", col(pCol) * factor(lit(n)) / col("rank"))
    ScaleWindows
      .globalSuffixMin(ranked, pCol, Seq(idCol), "__bhterm", "__tailmin",
        sizeHint = Some(n))
      .withColumn("q_value", least(lit(1.0), col("__tailmin")))
      .withColumn("significant", col("q_value") <= alpha)
      .drop("__bhterm", "__tailmin")
  }

  /** Pearson chi-square test of independence for two categorical
    * columns: one count aggregation, expected counts from the
    * marginals, Χ² summed through DECIMAL (order-independent), plus
    * the degrees of freedom. Output: one row
    * (chi2, dof, n, n_cells). The statistic's inputs are all BIGINT
    * counts, so every division/square is bit-identical cross-engine.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame =
    chiSquareFull(df, aCol, bCol)
      .select(col("chi2"),
        ((col("na") - 1) * (col("nb") - 1)).as("dof"),
        col("n"), (col("na") * col("nb")).as("n_cells"))

  /** Shared Χ² core: one row (chi2, n, na, nb) with the raw category
    * cardinalities kept so effect-size wrappers (Cramér's V) can see
    * the table shape. The statistic runs over the FULL r×c table —
    * the marginal cross product left-joins the observed cells, so an
    * empty cell contributes its expected count e (the (0−e)²/e term)
    * instead of silently vanishing.
    */
  private def chiSquareFull(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o")).persist()
    val rowT = cells.groupBy("a").agg(sum("o").as("ra"))
    val colT = cells.groupBy("b").agg(sum("o").as("cb"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("a").as("na"), countDistinct("b").as("nb"))
    val e = col("ra").cast("double") * col("cb") / col("n")
    rowT.crossJoin(colT)
      .join(cells, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("na"), col("nb"),
        ((col("o") - e) * (col("o") - e) / e)
          .cast(DecimalType(38, 18)).as("t"))
      .groupBy(col("n"), col("na"), col("nb"))
      .agg(round(sum(col("t")).cast("double"), 6).as("chi2"))
  }

  /** Cramér's V effect size for a two-way contingency table:
    * V = sqrt(Χ² / (n · (min(r, c) − 1))). The Χ² feeding the sqrt is
    * the 6-dp-rounded statistic (the same number q139 reports), so V
    * is a pure function of already-pinned values — one double divide
    * and one sqrt, bit-identical cross-engine. Output: one row
    * (chi2, dof, n, v).
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame =
    chiSquareFull(df, aCol, bCol)
      .select(col("chi2"),
        ((col("na") - 1) * (col("nb") - 1)).as("dof"), col("n"),
        round(sqrt(col("chi2") /
          (col("n") * (least(col("na"), col("nb")) - 1)).cast("double")),
          6).as("v"))

  /** One-way ANOVA F-test of `valueCol` across the groups of
    * `groupCol`. Sums of squares at 100 TB are ~1e15+, beyond what ANY
    * double pins to 6 dp, and int128/decimal→double casts round
    * differently across engines — so SSW/SSB stay EXACT integers
    * (×100 scale) end to end: pass 1 pins per-group/grand means as
    * doubles derived from exactly-representable long sums (values
    * 2-dp-quantized, sums < 2^53 through sf≈1); pass 2 re-scans with
    * the k means broadcast, quantizing each squared deviation to a
    * long BEFORE summation. Only int64→double casts (IEEE-exact in
    * both engines) feed the final F ratio, whose ×100 scales cancel.
    * One group-key shuffle + one broadcast-join scan. Output: one row
    * (k, n, ss_between_x100, ss_within_x100, f).
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("x")).persist()
    val v = floor(col("x") * lit(100.0) + lit(0.5)).cast("long")
    val grp = g.select(col("g"), v.as("v"))
      .groupBy("g").agg(count(lit(1)).as("n_i"), sum(col("v")).as("s_i"))
    val means = grp.select(col("g"), col("n_i"),
      ((col("s_i").cast("double") / col("n_i").cast("double")) /
        lit(100.0)).as("m_i"))
    val tot = grp.agg(count(lit(1)).as("k"), sum(col("n_i")).as("n"),
        sum(col("s_i")).as("s"))
      .select(col("k"), col("n"),
        ((col("s").cast("double") / col("n").cast("double")) /
          lit(100.0)).as("m"))
    val ssw = g.join(broadcast(means), Seq("g"))
      .select(floor((col("x") - col("m_i")) * (col("x") - col("m_i")) *
        lit(100.0) + lit(0.5)).cast("long").as("q"))
      .agg(sum(col("q")).as("ssw_x100"))
    val ssb = means.crossJoin(broadcast(tot))
      .select(col("k"), col("n"),
        floor(col("n_i").cast("double") * (col("m_i") - col("m")) *
          (col("m_i") - col("m")) * lit(100.0) + lit(0.5)).cast("long")
          .as("qb"))
      .groupBy("k", "n").agg(sum(col("qb")).as("ssb_x100"))
    ssb.crossJoin(broadcast(ssw))
      .select(col("k"), col("n"), col("ssb_x100").as("ss_between_x100"),
        col("ssw_x100").as("ss_within_x100"),
        round((col("ssb_x100").cast("double") /
            (col("k") - 1).cast("double")) /
          (col("ssw_x100").cast("double") /
            (col("n") - col("k")).cast("double")), 6).as("f"))
  }

  /** Per-group Wilson score interval (z = 1.96) for the proportion of
    * rows where `successCol` holds: every operand is an exact BIGINT
    * count or the shared z literal, and the center/half-width formula
    * is written in one fixed association order, so both engines run
    * the identical IEEE sequence. Output per group:
    * (group, n, successes, p_hat, ci_lo, ci_hi).
    */
  def wilson(df: DataFrame, groupCol: String, successCol: Column)
      : DataFrame = {
    val z2 = lit(1.96) * lit(1.96)
    val g = df.groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(successCol, 1L).otherwise(0L)).as("successes"))
    val n = col("n").cast("double")
    val p = col("successes").cast("double") / n
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(1.96) *
      sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n)) / denom
    g.select(col("group"), col("n"), col("successes"),
        round(p, 6).as("p_hat"),
        round(greatest(lit(0.0), center - half), 6).as("ci_lo"),
        round(least(lit(1.0), center + half), 6).as("ci_hi"))
      .orderBy("group")
  }

  /** Mutual information (nats) between two categorical columns, with
    * the marginal entropies and the sqrt-normalized NMI: every pᵢⱼ
    * ratio comes from exact BIGINT counts, per-cell/per-marginal
    * ln-terms sum through DECIMAL(38,18) (order-free), and NMI divides
    * the two pinned sums. Output: one row (n, mi, h_a, h_b, nmi).
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d18 = DecimalType(38, 18)
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o")).persist()
    val rowT = cells.groupBy("a").agg(sum("o").as("ra"))
    val colT = cells.groupBy("b").agg(sum("o").as("cb"))
    val tot = cells.agg(sum("o").as("n"))
    val nD = col("n").cast("double")
    val miSum = cells
      .join(broadcast(rowT), Seq("a"))
      .join(broadcast(colT), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("n"),
        ((col("o") / nD) *
          log(col("o") * col("n") / (col("ra") * col("cb")).cast("double")))
          .cast(d18).as("t"))
      .groupBy("n").agg(sum(col("t")).cast("double").as("mi"))
    def entropy(c: String): Column =
      sum(((col(c) / nD) * log(nD / col(c))).cast(d18)).cast("double")
    val ha = rowT.crossJoin(broadcast(tot)).agg(entropy("ra").as("h_a"))
    val hb = colT.crossJoin(broadcast(tot)).agg(entropy("cb").as("h_b"))
    miSum.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n"), round(col("mi"), 6).as("mi"),
        round(col("h_a"), 6).as("h_a"), round(col("h_b"), 6).as("h_b"),
        round(col("mi") / sqrt(col("h_a") * col("h_b")), 6).as("nmi"))
  }

  /** Cohen's kappa agreement between two label columns over the same
    * rows: pₒ from the diagonal count, pₑ from the marginal products
    * (Σ rₗ·cₗ in exact BIGINT), κ = (pₒ − pₑ)/(1 − pₑ) in one pinned
    * double sequence. Output: one row (n, agree, p_o, p_e, kappa).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val lab = df.select(col(aCol).as("a"), col(bCol).as("b")).persist()
    val tot = lab.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("agree"))
    val rowT = lab.groupBy("a").agg(count(lit(1)).as("ra"))
    val colT = lab.groupBy("b").agg(count(lit(1)).as("cb"))
    val pe = rowT.join(colT, col("a") === col("b"))
      .agg(sum(col("ra") * col("cb")).as("pe_num"))
    val nD = col("n").cast("double")
    val po = col("agree").cast("double") / nD
    val peD = col("pe_num").cast("double") / (nD * nD)
    tot.crossJoin(broadcast(pe))
      .select(col("n"), col("agree"), round(po, 6).as("p_o"),
        round(peD, 6).as("p_e"),
        round((po - peD) / (lit(1.0) - peD), 6).as("kappa"))
  }

  /** Theil's uncertainty coefficient U(X|Y) — the ASYMMETRIC
    * categorical association: the fraction of X's entropy explained
    * by knowing Y, (H(X) − H(X|Y)) / H(X) = I(X;Y)/H(X). Cramér's V
    * (q169) and MI (q170) are symmetric; U tells you WHICH column
    * predicts which. All three entropies come from one joint-count
    * aggregation with the quantized c·ln c sums (the l-diversity
    * recipe). Output one row per direction: direction, h_x, h_cond,
    * u (6 dp).
    */
  def theilsU(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c")).persist()
    val n = cells.agg(sum(col("c")).as("n"))
    def entropyOf(keyed: DataFrame): DataFrame =
      // H = ln N − (Σ c·ln c)/N over the grouped counts
      keyed.agg(
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long")).as("slq"))
    def h(groups: Seq[String]): DataFrame =
      entropyOf(cells.groupBy(groups.map(col): _*)
        .agg(sum(col("c")).as("c")))
    // H(X|Y) = H(X,Y) − H(Y)
    val hxy = entropyOf(cells).select(col("slq").as("q_xy"))
    val hx = h(Seq("a")).select(col("slq").as("q_x"))
    val hy = h(Seq("b")).select(col("slq").as("q_y"))
    val base = n.crossJoin(broadcast(hxy)).crossJoin(broadcast(hx))
      .crossJoin(broadcast(hy))
      .select(col("n").cast("double").as("nd"),
        (log(col("n").cast("double"))
          - col("q_xy").cast("double") / lit(1e9)
            / col("n").cast("double")).as("h_xy"),
        (log(col("n").cast("double"))
          - col("q_x").cast("double") / lit(1e9)
            / col("n").cast("double")).as("h_x"),
        (log(col("n").cast("double"))
          - col("q_y").cast("double") / lit(1e9)
            / col("n").cast("double")).as("h_y"))
    val xGivenY = base.select(lit("x|y").as("direction"),
      round(col("h_x"), 6).as("h_x"),
      round(col("h_xy") - col("h_y"), 6).as("h_cond"),
      round((col("h_x") - (col("h_xy") - col("h_y"))) / col("h_x"), 6)
        .as("u"))
    val yGivenX = base.select(lit("y|x").as("direction"),
      round(col("h_y"), 6).as("h_x"),
      round(col("h_xy") - col("h_x"), 6).as("h_cond"),
      round((col("h_y") - (col("h_xy") - col("h_x"))) / col("h_y"), 6)
        .as("u"))
    xGivenY.unionByName(yGivenX)
  }

  /** Empirical-copula dependence grid: both numeric columns bucket
    * into `nBuckets` exact marginal quantile bins (thresholds walked
    * on the VALUE DOMAIN with the integer ⌈i·N/n⌉ ranks — never a
    * float percentile), and the joint grid is reported with each
    * cell's expected-under-independence count and the overall Χ²
    * (quantized cell terms). Uniform marginals by construction, so
    * any cell structure IS dependence structure — the 2-D rank
    * companion to Spearman (q152)/Kendall (q253), localized to where
    * in the distribution the dependence lives. Value-domain work only:
    * two domain cums, one distinct-value bucket map join, one
    * n²-cell spine. Inputs must be integral (caller quantizes).
    * Output per cell: bx, by, n, expected (6 dp), ratio (6 dp), chi2
    * (repeated scalar, 6 dp).
    */
  def copulaGrid(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 64)
    val spark = df.sparkSession
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y")).persist()
    val nTotal = base.count()
    def bucketMap(c: String): DataFrame = {
      val dom = base.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val cum = dom.withColumn("cum", sum(col("cnt")).over(
        Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val spine = spark.range(1, nBuckets.toLong)
        .select(col("id").as("i"))
      val thr = cum.crossJoin(broadcast(spine))
        .filter(col("cum") >= expr(s"(i * $nTotal + $nBuckets - 1) div $nBuckets"))
        .groupBy("i").agg(min(col("v")).as("t"))
      dom.select(col("v")).crossJoin(broadcast(thr))
        .groupBy("v")
        .agg(sum(when(col("v") > col("t"), 1L).otherwise(0L)).as(s"b$c"))
    }
    val bucketed = base
      .join(bucketMap("x").withColumnRenamed("v", "x"), "x")
      .join(bucketMap("y").withColumnRenamed("v", "y"), "y")
    val cells = bucketed.groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("n"))
    val spine2 = spark.range(0, nBuckets.toLong).select(col("id").as("bx"))
      .crossJoin(spark.range(0, nBuckets.toLong).select(col("id").as("by")))
    val rowT = cells.groupBy("bx").agg(sum(col("n")).as("rx"))
    val colT = cells.groupBy("by").agg(sum(col("n")).as("cy"))
    val dense = spine2.join(cells, Seq("bx", "by"), "left")
      .na.fill(0L, Seq("n"))
      .join(broadcast(rowT), Seq("bx")).join(broadcast(colT), Seq("by"))
      .withColumn("e", col("rx").cast("double") * col("cy").cast("double")
        / lit(nTotal.toDouble))
    val chi2 = dense.agg(
      sum(floor((col("n").cast("double") - col("e"))
        * (col("n").cast("double") - col("e")) / col("e")
        * lit(1e9) + lit(0.5)).cast("long")).as("cq"))
      .select(round(col("cq").cast("double") / lit(1e9), 6).as("chi2"))
    dense.crossJoin(broadcast(chi2))
      .select(col("bx"), col("by"), col("n"),
        round(col("e"), 6).as("expected"),
        round(col("n").cast("double") / col("e"), 6).as("ratio"),
        col("chi2"))
      .orderBy("bx", "by")
  }

  /** Cochran–Mantel–Haenszel test of a binary exposure/outcome
    * association across strata: per stratum the 2×2 cell a = |e∧o|
    * with margins r1 = |e|, c1 = |o|, n; the statistic pools
    * (a − E)² / V with E = r1·c1/n and hypergeometric
    * V = r1(n−r1)·c1(n−c1) / (n²(n−1)) — the stratified test that
    * chi-square (q139 [[chiSquare]]) collapses incorrectly when
    * strata confound (Simpson's). CMH χ² = (Σa − ΣE)² / ΣV.
    *
    * Determinism: margins are exact integers from one hash
    * aggregation; E and V are fixed IEEE chains whose operand products
    * stay ≤ n²/4 (exactly representable — V is factored as
    * (r1(n−r1)/n)·(c1(n−c1)/n)/(n−1) so no intermediate exceeds
    * 2^53); per-stratum terms quantize to 1e-9 before the cross-strata
    * sums. Output one row: `n_strata`, `o_sum`, `e_sum`, `v_sum`,
    * `chi2` (6 dp).
    */
  def cmh(df: DataFrame, stratumCol: String, exposedCol: String,
          outcomeCol: String): DataFrame = {
    val cells = df.groupBy(col(stratumCol).as("s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(exposedCol), 1L).otherwise(0L)).as("r1"),
        sum(when(col(outcomeCol), 1L).otherwise(0L)).as("c1"),
        sum(when(col(exposedCol) && col(outcomeCol), 1L).otherwise(0L))
          .as("a"))
      .filter(col("n") > 1)
    val e = (col("r1") * col("c1")).cast("double") / col("n").cast("double")
    val v = (((col("r1") * (col("n") - col("r1"))).cast("double")
        / col("n").cast("double"))
      * ((col("c1") * (col("n") - col("c1"))).cast("double")
        / col("n").cast("double"))
      / (col("n") - lit(1)).cast("double"))
    val agg = cells.agg(
      count(lit(1)).as("n_strata"), sum(col("a")).as("o_sum"),
      sum(floor(e * lit(1e9) + lit(0.5)).cast("long")).as("eq"),
      sum(floor(v * lit(1e9) + lit(0.5)).cast("long")).as("vq"))
    agg.select(col("n_strata"), col("o_sum"),
        (col("eq").cast("double") / lit(1e9)).as("ed"),
        (col("vq").cast("double") / lit(1e9)).as("vd"))
      .select(col("n_strata"), col("o_sum"),
        round(col("ed"), 6).as("e_sum"), round(col("vd"), 6).as("v_sum"),
        round((col("o_sum").cast("double") - col("ed"))
          * (col("o_sum").cast("double") - col("ed")) / col("vd"), 6)
          .as("chi2"))
  }

  /** Brown–Forsythe test (Levene with the median center): variance
    * homogeneity across groups, robust to non-normality — the
    * assumption check ANOVA (q167) itself needs. z = |x − med_g| with
    * med_g the LOWER median (rank ⌊(n+1)/2⌋ ordered by (value, id) —
    * an integer for integer inputs, so z is exact and both engines
    * rank identically), then the statistic is one-way ANOVA F on z via
    * [[anovaF]]'s exact-integer two-pass. `valueCol` must be integral
    * in CENTI-units (cents): z feeds anovaF as |x − med| / 100 —
    * anovaF re-quantizes ×100, recovering the exact integer cent
    * difference, and its ssw quantization (z² · 100) then stays within
    * long range where raw centi-scale deviations would overflow.
    * Shape: one rank window + one join + the anovaF passes — all
    * group-keyed shuffles, no pair joins.
    */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"), col(idCol).as("id"))
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    val med = base.withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("rn") === expr("(nn + 1) div 2"))
      .select(col("g"), col("v").as("med"))
    val z = base.join(med, Seq("g"))
      .select(col("g"),
        (abs(col("v") - col("med")).cast("double") / lit(100.0)).as("z"))
    anovaF(z, "g", "z")
  }

  /** Grubbs' statistic per group: G = max|x − mean| / sd over integral
    * `valueCol`, with the candidate outlier pinned WITHOUT floats —
    * the argmax compares |n·x − Σx| (exact integers), tie-broken by
    * `idCol`, so the reported outlier is bit-deterministic. mean/sd
    * come from exact integer moments (Σx, Σx² as longs — callers
    * quantize coarsely enough that Σx² < 2⁵³; at 100 TB route the
    * moments through DECIMAL); G is one fixed-shape double expression.
    * Output: (group, n, outlier_id, outlier_val, g_stat).
    */
  def grubbs(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      col(valueCol).cast("long").as("v"), col(idCol).as("id"))
    val mo = base.groupBy("g").agg(count(lit(1)).as("n"),
      sum(col("v")).as("s1"), sum(col("v") * col("v")).as("s2"))
    val dev = base.join(mo, Seq("g"))
      .withColumn("adev", abs(col("n") * col("v") - col("s1")))
    val w = Window.partitionBy("g")
      .orderBy(col("adev").desc, col("id"))
    val top = dev.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
    val nd = col("n").cast("double")
    val varN = (nd * col("s2").cast("double")
      - col("s1").cast("double") * col("s1").cast("double")) /
      (nd * (nd - lit(1.0)))
    top.select(col("g").as("group"), col("n"), col("id").as("outlier_id"),
      col("v").as("outlier_val"),
      round((col("adev").cast("double") / nd) / sqrt(varN), 6)
        .as("g_stat"))
  }

  /** Cohen's d + Hedges' g between the two arms of `armCol` (a boolean
    * column; true = arm 1) on integral `valueCol`: d = (m₁ − m₀) /
    * s_pooled, g = d · (1 − 3/(4n − 9)). Every mean and the pooled
    * variance derive from exact integer moments; one agg, no second
    * pass (variance via n·Σx² − (Σx)²). Output per group:
    * (group, n1, n0, d, hedges_g).
    */
  def cohensD(df: DataFrame, groupCol: String, armCol: Column,
      valueCol: String): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      armCol.cast("boolean").as("arm"),
      col(valueCol).cast("long").as("v"))
    val mo = base.groupBy("g", "arm").agg(count(lit(1)).as("n"),
      sum(col("v")).as("s1"), sum(col("v") * col("v")).as("s2"))
    def side(a: Boolean, suf: String) =
      mo.filter(col("arm") === a).select(col("g"),
        col("n").as(s"n$suf"), col("s1").as(s"s1$suf"),
        col("s2").as(s"s2$suf"))
    val j = side(true, "1").join(side(false, "0"), Seq("g"))
    def d(c: String) = col(c).cast("double")
    val ssd = (c: String) => // group sum of squared deviations ·n
      d(s"n$c") * d(s"s2$c") - d(s"s1$c") * d(s"s1$c")
    val m1 = d("s11") / d("n1")
    val m0 = d("s10") / d("n0")
    val sp = sqrt((ssd("1") / d("n1") + ssd("0") / d("n0")) /
      (d("n1") + d("n0") - lit(2.0)))
    val dd = (m1 - m0) / sp
    j.select(col("g").as("group"), col("n1"), col("n0"),
      round(dd, 6).as("d"),
      round(dd * (lit(1.0) - lit(3.0) /
        (lit(4.0) * (d("n1") + d("n0")) - lit(9.0))), 6).as("hedges_g"))
  }

  /** Benjamini–Yekutieli adjusted q-values: BH's n is inflated by the
    * harmonic factor c(n) = Σ 1/i — valid under ARBITRARY dependence,
    * the conservative fallback when BH's independence assumption is
    * suspect. c(n) is computed as Σ ⌊10⁹/i⌋ EXACT integer divisions
    * (the driver-side Scala sum and any SQL replay produce the same
    * integer), so both engines scale by bit-identical factors.
    * Same window shapes as [[bhAdjust]].
    */
  def byAdjust(df: DataFrame, pCol: String, idCol: String,
      alpha: Double = 0.05): DataFrame = {
    val n = df.count()
    val hq = (1L to n).map(1000000000L / _).sum
    val cFac = lit(n.toDouble) * (lit(hq.toDouble) / lit(1e9))
    fdrAdjust(df, pCol, idCol, alpha, _ => cFac)
  }

  /** Cochran's Q for k related binary treatments: Q = (k−1)·(k·ΣC_j²
    * − N²) / (k·N − ΣR_i²) over the subject × treatment success
    * matrix — does success rate differ across the k conditions, with
    * every operand an exact integer and one final double division.
    * Input: (subject, treatment, success boolean); subjects missing a
    * treatment count as failure there (the flags frame should be
    * dense — build it with a crossJoin of subjects × treatments).
    * Output: (k, n_subjects, n_successes, q_stat).
    */
  def cochranQ(df: DataFrame, subjectCol: String, treatmentCol: String,
      successCol: Column): DataFrame = {
    val base = df.select(col(subjectCol).as("s"),
      col(treatmentCol).as("t"),
      when(successCol, 1L).otherwise(0L).as("x"))
    val cj = base.groupBy("t").agg(sum("x").as("c"))
    val colAgg = cj.agg(count(lit(1)).as("k"), sum("c").as("nn"),
      sum(col("c") * col("c")).as("sc2"))
    val ri = base.groupBy("s").agg(sum("x").as("r"))
    val rowAgg = ri.agg(count(lit(1)).as("n_subjects"),
      sum(col("r") * col("r")).as("sr2"))
    colAgg.crossJoin(rowAgg)
      .select(col("k"), col("n_subjects"), col("nn").as("n_successes"),
        when(col("k") * col("nn") - col("sr2") > 0,
          round(((col("k") - 1) * (col("k") * col("sc2")
            - col("nn") * col("nn"))).cast("double")
            / (col("k") * col("nn") - col("sr2")).cast("double"), 6))
          .as("q_stat"))
  }
}
