package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key trend analytics over bounded ordered series (daily rollups,
  * sensor windows): the Mann–Kendall trend statistic with a Theil–Sen
  * slope, Holt double-exponential smoothing, and CUSUM changepoint
  * detection.
  *
  * Scale shapes: series here are BOUNDED per key (a day index, a
  * fixed sensor window), so the pair generation in
  * [[mannKendall]] is O(k²) per key on a per-key-bounded k — a
  * broadcast-sized frame per group, never a corpus cross join. The
  * fold operators ([[holt]], [[cusum]]) collect each key's bounded
  * history into an array in ONE hash aggregation and run a codegen'd
  * sequential fold — same recipe as [[Rolling.ewma]]; unbounded
  * histories belong to the streaming twins.
  *
  * Determinism: every recurrence folds from the FIRST element in
  * explicit order (DuckDB's list_reduce shape); smoothing factors must
  * be exact binary fractions so their complements are bit-identical;
  * sign decisions compare doubles that both engines computed from the
  * same exact (DECIMAL-summed, 6-dp-rounded) inputs.
  */
object Trend {

  /** Mann–Kendall S = Σ_{i<j} sign(xⱼ−xᵢ) plus the Theil–Sen slope
    * (the LOWER median of pairwise slopes, tie-broken by (slope, i, j))
    * per key, over rows ordered by integer `idxCol`. Output: key, `n`
    * (series length), `n_pairs`, `s_stat`, `theil_sen` (6 dp).
    */
  def mannKendall(df: DataFrame, keyCol: String, idxCol: String,
                  valueCol: String): DataFrame = {
    val l = df.select(col(keyCol).as("k"), col(idxCol).as("i"),
      col(valueCol).as("vi"))
    val r = df.select(col(keyCol).as("k2"), col(idxCol).as("j"),
      col(valueCol).as("vj"))
    val pairs = l.join(r, col("k") === col("k2") && col("i") < col("j"))
      .select(col("k"), col("i"), col("j"),
        (col("vj") - col("vi")).as("dv"),
        ((col("vj") - col("vi")) / (col("j") - col("i"))).as("slope"))
    val w = Window.partitionBy("k").orderBy(col("slope"), col("i"), col("j"))
    val ranked = pairs
      .select(col("k"), col("dv"), col("slope"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(Window.partitionBy("k")).as("n_pairs"))
    val nSeries = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("n"))
    val agg = ranked.groupBy("k", "n_pairs")
      .agg(sum(signum(col("dv")).cast("long")).as("s_stat"),
        // lower median: the row at rank (n_pairs+1) div 2 (integer div)
        max(when(col("rn") === expr("(n_pairs + 1) div 2"), col("slope")))
          .as("ts_slope"))
    nSeries.join(agg, "k")
      .select(col("k").as(keyCol), col("n"), col("n_pairs"),
        col("s_stat"), round(col("ts_slope"), 6).as("theil_sen"))
  }

  /** Holt linear (double-exponential) smoothing per key with α pinned
    * to ½: l₁ = x₁, t₁ = 0; lᵢ = ½xᵢ + ½(lᵢ₋₁+tᵢ₋₁) and the trend
    * update in its α=½ NEW-LEVEL form tᵢ = β(xᵢ−lᵢ) + tᵢ₋₁ (identical
    * algebra to the textbook β(lᵢ−lᵢ₋₁)+(1−β)tᵢ₋₁, but every operand
    * is either the fresh level or untouched state — the shape DuckDB's
    * list_reduce reproduces op-for-op, since its struct accumulator
    * updates FIELDS SEQUENTIALLY and a later field expression sees the
    * earlier field already overwritten). β must be an exact binary
    * fraction. Output: key, `n`, `level`, `trend`, `forecast` =
    * level+trend (all 6 dp).
    */
  def holt(df: DataFrame, keyCol: String, orderCol: String,
           valueCol: String, beta: Double): DataFrame = {
    require(beta > 0 && beta < 1)
    val sorted = df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("__o"), col(valueCol).cast("double").as("__v"))))
        .as("__s"), count(lit(1)).as("n"))
    val vals = transform(col("__s"), e => e.getField("__v"))
    val st = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      named_struct(lit("l"), element_at(vals, 1), lit("t"), lit(0.0)),
      (acc, x) => {
        val nl = lit(0.5) * x +
          lit(0.5) * (acc.getField("l") + acc.getField("t"))
        named_struct(lit("l"), nl,
          lit("t"), lit(beta) * (x - nl) + acc.getField("t"))
      })
    sorted.select(col(keyCol), col("n"), st.as("__st"))
      .select(col(keyCol), col("n"),
        round(col("__st.l"), 6).as("level"),
        round(col("__st.t"), 6).as("trend"),
        round(col("__st.l") + col("__st.t"), 6).as("forecast"))
  }

  /** Additive seasonal decomposition with residual anomaly scores:
    * trend = centered moving average (±`halfWindow` rows, truncated at
    * series edges), seasonal = per-(key, idx mod `period`) mean of the
    * detrended values, residual = value − trend − seasonal, and a
    * per-key z-score of the residual with `is_anomaly` =
    * |z| > `zThreshold`.
    *
    * Three window passes over the SAME (key, idx) sort order —
    * Catalyst reuses one shuffle — plus one window keyed by
    * (key, phase). Determinism: every mean divides an exact DECIMAL
    * sum (cast to double < 2⁵³) by an integer count and is 6-dp
    * quantized before feeding the next stage; residual moments ride
    * quantized longs summed in DECIMAL, so σ and z derive from exact
    * operands in one fixed-order expression. The anomaly flag
    * compares the UNROUNDED z.
    */
  def seasonalDecompose(df: DataFrame, keyCol: String, idxCol: String,
                        valueCol: String, period: Int, halfWindow: Int,
                        zThreshold: Double): DataFrame = {
    require(period >= 2 && halfWindow >= 1)
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val wTrend = Window.partitionBy(col(keyCol)).orderBy(col(idxCol))
      .rowsBetween(-halfWindow, halfWindow)
    val tr = df.withColumn("trend",
      round(sum(col(valueCol).cast(dec)).over(wTrend).cast("double") /
        count(lit(1)).over(wTrend), 6))
    val dt = tr
      .withColumn("__wd", col(idxCol) % period)
      .withColumn("__detrend", round(col(valueCol) - col("trend"), 6))
    val wSeason = Window.partitionBy(col(keyCol), col("__wd"))
    val se = dt.withColumn("seasonal",
      round(sum(col("__detrend").cast(dec)).over(wSeason).cast("double") /
        count(lit(1)).over(wSeason), 6))
    val res = se
      .withColumn("resid",
        round(col(valueCol) - col("trend") - col("seasonal"), 6))
      .withColumn("__rq",
        floor(col("resid") * lit(1000000.0) + lit(0.5)).cast("long"))
    val wKey = Window.partitionBy(col(keyCol))
    val st = res
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__sr",
        sum(col("__rq").cast(big)).over(wKey).cast("double") /
          lit(1000000.0))
      .withColumn("__srr",
        sum(col("__rq").cast(big) * col("__rq").cast(big)).over(wKey)
          .cast("double") / lit(1000000000000.0))
    val sigma = sqrt((col("__srr") - col("__sr") * col("__sr") / col("__n")) /
      (col("__n") - 1))
    st.select(col(keyCol), col(idxCol), col(valueCol), col("trend"),
      col("seasonal"), col("resid"),
      round(col("resid") / sigma, 6).as("z"),
      (abs(col("resid") / sigma) > lit(zThreshold)).as("is_anomaly"))
  }

  /** One-sided CUSUM drift detector per key: S₀ = 0,
    * Sᵢ = max(0, Sᵢ₋₁ + xᵢ − target), reporting the series max of S —
    * computed in its WINDOW closed form max_i (cᵢ − min(0, min_{j≤i}
    * cⱼ)) where c is the running sum of (x − target). No per-key array
    * ever materializes (this scales to unbounded series), and because
    * x and target are 6-dp-quantized the running sums ride DECIMAL:
    * every comparison and max is exact, immune to both engines'
    * float-summation order. `target` is a per-key (or
    * broadcast-constant) column, pre-rounded to 6 dp by the caller.
    * Output: key, `n`, `max_cusum` (6 dp), `rel` = max/target (6 dp).
    */
  def cusum(df: DataFrame, keyCol: String, orderCol: String,
            valueCol: String, targetCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = sum(col(valueCol).cast(dec) - col(targetCol).cast(dec)).over(w)
    val run = df.select(col(keyCol), col(orderCol), col(targetCol), c.as("__c"))
    val sv = col("__c") - least(lit(0).cast(dec), min(col("__c")).over(w))
    run.select(col(keyCol), col(targetCol).as("__tgt"), sv.as("__sv"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), max(col("__sv")).as("__m"),
        first(col("__tgt")).as("__t"))
      .select(col(keyCol), col("n"),
        round(col("__m").cast("double"), 6).as("max_cusum"),
        round(col("__m").cast("double") / col("__t"), 6).as("rel"))
  }

  /** Single best mean-shift changepoint per key (the AMOC split): over
    * the series ordered by `idxCol`, the split t maximizing the SSE
    * reduction gain(t) = n_l·n_r/n · (m_l − m_r)². Values quantize to
    * ×100 longs, so every prefix sum is exact; the gain is one pinned
    * int64→double IEEE sequence per split, and the argmax compares
    * those identically-computed doubles with an idx tie-break — both
    * engines pick the same split. One window pass over each key's
    * bounded series + one broadcast of per-key totals. Output: key,
    * split idx, n_left/right, means (6 dp), gain (6 dp).
    */
  def meanShiftChangepoint(df: DataFrame, keyCol: String, idxCol: String,
                           valCol: String): DataFrame = {
    val v = floor(col(valCol) * lit(100.0) + lit(0.5)).cast("long")
    val base = df.select(col(keyCol).as("k"), col(idxCol).as("idx"),
      v.as("v"))
    val tot = base.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val w = Window.partitionBy("k").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = base
      .select(col("k"), col("idx"),
        count(lit(1)).over(w).as("nl"), sum(col("v")).over(w).as("sl"))
      .join(broadcast(tot), Seq("k"))
      .where(col("nl") < col("n"))
    val ml = (col("sl").cast("double") / col("nl").cast("double")) /
      lit(100.0)
    val mr = ((col("s") - col("sl")).cast("double") /
      (col("n") - col("nl")).cast("double")) / lit(100.0)
    val gain = (ml - mr) * (ml - mr) * col("nl").cast("double") *
      (col("n") - col("nl")).cast("double") / col("n").cast("double")
    val ranked = pre.select(col("k"), col("idx"), col("nl"), col("n"),
      ml.as("ml"), mr.as("mr"), gain.as("g"))
    val pick = Window.partitionBy("k")
      .orderBy(col("g").desc, col("idx"))
    ranked.withColumn("rn", row_number().over(pick))
      .where(col("rn") === 1)
      .select(col("k").as("key"), col("idx").as("split_idx"),
        col("nl").as("n_left"), (col("n") - col("nl")).as("n_right"),
        round(col("ml"), 6).as("mean_left"),
        round(col("mr"), 6).as("mean_right"),
        round(col("g"), 6).as("gain"))
  }

  /** Cross-correlation function between two metrics of ONE global
    * series at lags 0..`maxLag`: r_k = Σ(x_t−x̄)(y_{t+k}−ȳ) /
    * √(Σ(x−x̄)²·Σ(y−ȳ)²) — the standard CCF estimator with global
    * means and a lag-independent normalizer. Means come from
    * DECIMAL-summed aggregates broadcast back; all lagged products
    * ride ONE window pass; product sums go through DECIMAL
    * (order-free). The single-partition window is fine BY DESIGN:
    * this runs on an already-aggregated bounded series (daily
    * rollups), thousands of rows however big the raw table — the
    * heavy lifting (the daily aggregation) happened upstream in
    * parallel. Output: one row, n plus r0..r`maxLag`.
    */
  def crossCorrelation(df: DataFrame, idxCol: String, xCol: String,
                       yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 12)
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val means = df.agg(
      (sum(col(xCol).cast(DecTotals)).cast("double") / count(lit(1)))
        .as("mx"),
      (sum(col(yCol).cast(DecTotals)).cast("double") / count(lit(1)))
        .as("my"))
    val w = Window.orderBy(col(idxCol))
    val lagged = df.crossJoin(broadcast(means))
      .select(Seq(col(xCol).as("x"), col("mx"), col("my"),
        col(yCol).as("y0")) ++
        (1 to maxLag).map(k => lead(col(yCol), k).over(w).as(s"y$k")): _*)
    val dx = col("x") - col("mx")
    val sums =
      sum((dx * dx).cast(dec)).as("sxx") +:
      sum(((col("y0") - col("my")) * (col("y0") - col("my"))).cast(dec))
        .as("syy") +:
      (0 to maxLag).map(k =>
        sum((dx * (col(s"y$k") - col("my"))).cast(dec)).as(s"s$k"))
    val agg = lagged.agg(count(lit(1)).as("n"), sums: _*)
    val den = sqrt(col("sxx").cast("double") * col("syy").cast("double"))
    agg.select(col("n") +:
      (0 to maxLag).map(k =>
        round(col(s"s$k").cast("double") / den, 6).as(s"r$k")): _*)
  }

  /** Durbin–Watson residual-autocorrelation statistic per key: fit
    * y = a + b·x by OLS from exact moments (x integral, y a
    * 6-dp-quantized value summed through DECIMAL(18,6) — the q157
    * rule), then DW = Σ(e_t − e_{t−1})² / Σe_t² over the
    * fit residuals in series order. DW ≈ 2 means uncorrelated
    * residuals; → 0 positive, → 4 negative autocorrelation — the
    * standard regression-diagnostic companion to the per-key OLS
    * (q140) and autocorrelation (q147) queries.
    *
    * Determinism: the OLS moments are exact (long / DECIMAL), so a and
    * b are fixed IEEE chains over exact operands; each residual is the
    * same chain per row, and both cross-row sums quantize each term to
    * 1e-9 fixed point first. The lag window partitions by key over the
    * bounded per-key series — parallel, never a global sort. Output
    * per key: `n`, `slope`, `intercept` (6 dp), `dw` (6 dp).
    */
  def durbinWatson(df: DataFrame, keyCol: String, idxCol: String,
      valCol: String): DataFrame = {
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val base = df.select(col(keyCol).as("k"), col(idxCol).as("x"),
      col(valCol).as("y"))
    val mom = base.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y").cast(d6)).as("sy"),
      sum(col("y").cast(d6) * col("x")).as("sxy"))
    val fit = mom
      .withColumn("b",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .select(col("k"), col("n"), col("b"),
        ((col("sy").cast("double") - col("b") * col("sx").cast("double"))
          / col("n").cast("double")).as("a"))
    val res = base.join(broadcast(fit), Seq("k"))
      .withColumn("e",
        col("y").cast("double")
          - (col("a") + col("b") * col("x").cast("double")))
    val w = Window.partitionBy("k").orderBy("x")
    val lagged = res.withColumn("ep", lag(col("e"), 1).over(w))
    lagged.groupBy(col("k"), col("n"), col("a"), col("b"))
      .agg(
        sum(floor(col("e") * col("e") * lit(1e9) + lit(0.5)).cast("long"))
          .as("sse"),
        sum(when(col("ep").isNotNull,
          floor((col("e") - col("ep")) * (col("e") - col("ep")) * lit(1e9)
            + lit(0.5)).cast("long")).otherwise(0L)).as("ssd"))
      .select(col("k").as(keyCol), col("n"),
        round(col("b"), 6).as("slope"), round(col("a"), 6).as("intercept"),
        round(col("ssd").cast("double") / col("sse").cast("double"), 6)
          .as("dw"))
  }

  /** Alpha-beta (g-h) tracking filter per key: the constant-gain
    * steady-state Kalman for a position+velocity state —
    * x̂ = x + v; r = z − x̂; x ← x̂ + α·r; v ← v + β·r — the classic
    * sensor-smoothing recurrence next to Holt (which smooths level +
    * trend with a different gain law). Same distribution shape as
    * [[holt]]: one collect-sort per key (bounded series), one
    * sequential struct fold replayed op-for-op by the oracle's
    * recursive CTE. Init: x = first value, v = 0. Output per key:
    * n, x (position), v (velocity), forecast = x + v (6 dp).
    */
  def alphaBeta(df: DataFrame, keyCol: String, orderCol: String,
                valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1)
    val sorted = df.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("__o"), col(valueCol).cast("double").as("__v"))))
        .as("__s"), count(lit(1)).as("n"))
    val vals = transform(col("__s"), e => e.getField("__v"))
    val st = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      named_struct(lit("x"), element_at(vals, 1), lit("v"), lit(0.0)),
      (acc, z) => {
        val pred = acc.getField("x") + acc.getField("v")
        val r = z - pred
        named_struct(lit("x"), pred + lit(alpha) * r,
          lit("v"), acc.getField("v") + lit(beta) * r)
      })
    sorted.select(col(keyCol), col("n"), st.as("__st"))
      .select(col(keyCol), col("n"),
        round(col("__st.x"), 6).as("x"),
        round(col("__st.v"), 6).as("v"),
        round(col("__st.x") + col("__st.v"), 6).as("forecast"))
  }

  /** Matrix-profile-lite motif discovery: the closest pair of
    * z-normalized length-`win` subsequences of each key's series —
    * "which two weeks looked most alike", the basic shapelet/motif
    * primitive. Subsequences come from ONE ordered window collect per
    * key (bounded: |series| windows of `win` values each); the
    * pairwise distance join is O(windows²) PER KEY — the bounded-
    * domain contract, never corpus-quadratic.
    *
    * Determinism: every per-window statistic (mean, σ) and the
    * distance are sequential left-folds over the same frame-ordered
    * array on both engines (the q16 fold idiom), so the doubles are
    * bit-identical; constant windows (σ = 0) are excluded. Output per
    * key: (key, start_a, start_b, dist 6 dp) for the minimal pair,
    * ties broken by (start_a, start_b).
    */
  def motif(df: DataFrame, keyCol: String, idxCol: String,
            valCol: String, win: Int): DataFrame = {
    require(win >= 2 && win <= 64)
    val wFrame = Window.partitionBy(col(keyCol)).orderBy(col(idxCol))
      .rowsBetween(Window.currentRow, win - 1)
    def fsum(arr: Column): Column =
      aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val subs = df
      .withColumn("arr", collect_list(col(valCol).cast("double"))
        .over(wFrame))
      .filter(size(col("arr")) === win)
      .select(col(keyCol).as("k"), col(idxCol).as("start"), col("arr"))
      .withColumn("m", fsum(col("arr")) / lit(win.toDouble))
      .withColumn("sd", sqrt(fsum(transform(col("arr"),
        x => (x - col("m")) * (x - col("m")))) / lit(win.toDouble)))
      .filter(col("sd") > 0)
      .persist()
    val pairs = subs.as("a").join(subs.as("b"),
      col("a.k") === col("b.k") && col("a.start") < col("b.start"))
    val d2 = fsum(zip_with(col("a.arr"), col("b.arr"),
      (x, y) => ((x - col("a.m")) / col("a.sd")
        - (y - col("b.m")) / col("b.sd"))
        * ((x - col("a.m")) / col("a.sd")
          - (y - col("b.m")) / col("b.sd"))))
    val scored = pairs.select(col("a.k").as(keyCol),
      col("a.start").as("start_a"), col("b.start").as("start_b"),
      d2.as("d2"))
    val pick = Window.partitionBy(keyCol)
      .orderBy(col("d2"), col("start_a"), col("start_b"))
    scored.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("start_a"), col("start_b"),
        round(sqrt(col("d2")), 6).as("dist"))
  }

  /** Inter-arrival exponential goodness of fit per key: gaps between
    * consecutive event times (seconds), the MLE rate λ = 1/mean from
    * exact integer gap sums, and the exact KS distance between the
    * empirical gap CDF and Exp(λ) — D·n = max over the gap DOMAIN of
    * max(|cum − n·F(t)|, |cum − c_t − n·F(t)|) evaluated at each
    * distinct gap (the one-sample KS needs both the pre- and
    * post-step gap). F(t) = 1 − e^(−λt) is the only libm call (exp,
    * already shared by the entropy oracles). Domain-sized window
    * work only. Output per key: n_gaps, mean_gap_s (6 dp), lambda
    * (6 dp), ks_d (6 dp).
    */
  def interarrivalFit(df: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val gaps = df
      .withColumn("prev", lag(col(tsCol), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col(keyCol).as("k"),
        // explicit floor: a bare double->int cast truncates in Spark
        // but ROUNDS in DuckDB -- floor() agrees everywhere
        floor((col(tsCol) - col("prev")).cast("double") / lit(1e6))
          .cast("long").as("g"))
      .filter(col("g") >= 0)
    val dom = gaps.groupBy("k", "g").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("k").orderBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = gaps.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"))
      .select(col("k"), col("n"), col("sg"),
        (col("n").cast("double") / col("sg").cast("double"))
          .as("lambda"))
    val cum = dom.withColumn("cum", sum(col("c")).over(cumW))
      .join(tot, Seq("k"))
      .withColumn("f", lit(1.0)
        - exp(lit(-1.0) * col("lambda") * col("g").cast("double")))
      .withColumn("d", greatest(
        abs(col("cum").cast("double")
          - col("n").cast("double") * col("f")),
        abs((col("cum") - col("c")).cast("double")
          - col("n").cast("double") * col("f"))))
    cum.groupBy(col("k"), col("n"), col("sg"), col("lambda"))
      .agg(max(col("d")).as("dmax"))
      .select(col("k").as(keyCol), col("n").as("n_gaps"),
        round(col("sg").cast("double") / col("n").cast("double"), 6)
          .as("mean_gap_s"),
        round(col("lambda"), 6).as("lambda"),
        round(col("dmax") / col("n").cast("double"), 6).as("ks_d"))
  }

  /** One-level Haar wavelet energy split per key: consecutive value
    * pairs (in `idxCol` order) decompose into approximation
    * a = (x₁+x₂)/2 and detail d = (x₁−x₂)/2; the detail-energy share
    * Σd²/(Σa²+Σd²) measures how much of the series' energy lives in
    * fast alternation vs slow structure — the cheapest
    * frequency-split diagnostic beside autocorrelation (q147). The
    * pairing walks a per-key window (parallel); dangling last rows
    * drop; the energy sums ride DECIMAL(28,6) (each a2/d2 term is
    * 6-dp-rounded by the cast -- a 1e9-scaled long would overflow at
    * warehouse-scale daily sums). Output per key: n_pairs, e_approx,
    * e_detail, detail_ratio (6 dp).
    */
  def haarEnergy(df: DataFrame, keyCol: String, idxCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idxCol))
    val paired = df
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col(valCol).cast("double"), 1).over(w))
      .filter(col("rn") % 2 === 1 && col("nxt").isNotNull)
      .select(col(keyCol).as("k"),
        ((col(valCol).cast("double") + col("nxt")) / lit(2.0)).as("a"),
        ((col(valCol).cast("double") - col("nxt")) / lit(2.0)).as("d"))
    // 1e6-quantized split-long sums (the q124 recipe): floor(x*1e6+0.5)
    // is pure IEEE (identical everywhere), where a DECIMAL cast of a
    // large double rounds differently across engines at the last ulp
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("long")
    def recomb(hi: String, lo: String) =
      (graft.Cols.ref(hi).cast("decimal(38,0)") * lit(1048576L)
        + graft.Cols.ref(lo)).cast("double") / lit(1e6)
    paired.groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(shiftright(q6(col("a") * col("a")), 20)).as("ea_hi"),
        sum(q6(col("a") * col("a")).bitwiseAND(lit(1048575L))).as("ea_lo"),
        sum(shiftright(q6(col("d") * col("d")), 20)).as("ed_hi"),
        sum(q6(col("d") * col("d")).bitwiseAND(lit(1048575L))).as("ed_lo"))
      .select(col("k").as(keyCol), col("n_pairs"),
        round(recomb("ea_hi", "ea_lo"), 6).as("e_approx"),
        round(recomb("ed_hi", "ed_lo"), 6).as("e_detail"),
        round(recomb("ed_hi", "ed_lo")
          / (recomb("ea_hi", "ea_lo") + recomb("ed_hi", "ed_lo")), 6)
          .as("detail_ratio"))
  }

  /** Chow structural-break test per key: does the linear trend of
    * (tCol, integral vCol) change at the series midpoint? F =
    * ((SSRp − SSR₁ − SSR₂)/2) / ((SSR₁ + SSR₂)/(n − 4)), with each
    * SSR from the closed form Syy − Sxy²/Sxx over EXACT integer moment
    * sums (t and v are integral; the only doubles are the three final
    * fixed-shape SSR expressions and the F ratio). The break point is
    * t ≤ ⌊(min+max)/2⌋ — data-derived, deterministic. One grouped agg
    * per segment + one for the pooled window; no sort, no window.
    * Output: (key, n, break_t, f).
    */
  def chowTest(df: DataFrame, keyCol: String, tCol: String,
      vCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("k"),
      col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v"))
    val cut = base.groupBy("k")
      .agg(((min("t") + max("t")) / 2).cast("long").as("cut"))
    val seg = base.join(cut, Seq("k"))
      .withColumn("s", when(col("t") <= col("cut"), 1L).otherwise(2L))
    def moments(d: DataFrame, by: Seq[String]): DataFrame =
      d.groupBy(by.map(col): _*).agg(count(lit(1)).as("n"),
        sum("t").as("st"), sum("v").as("sv"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("v")).as("stv"),
        sum(col("v") * col("v")).as("svv"))
    def ssr: Column = { // Syy − Sxy²/Sxx on centered exact moments
      def d(c: String) = col(c).cast("double")
      val sxx = d("stt") - d("st") * d("st") / d("n")
      val sxy = d("stv") - d("st") * d("sv") / d("n")
      val syy = d("svv") - d("sv") * d("sv") / d("n")
      syy - sxy * sxy / sxx
    }
    val pooled = moments(seg, Seq("k")).join(cut, Seq("k"))
      .select(col("k"), col("n"), col("cut"), ssr.as("ssr_p"))
    val parts = moments(seg, Seq("k", "s"))
      .select(col("k"), col("s"), ssr.as("ssr_s"))
      .groupBy("k").agg(sum("ssr_s").as("ssr_12"))
    pooled.join(parts, Seq("k"))
      .select(col("k").as(keyCol), col("n"), col("cut").as("break_t"),
        // a perfectly-fit pair of segments has ssr_12 = 0 → F is
        // undefined (infinite evidence); emit null rather than trip
        // ANSI divide-by-zero
        when(col("ssr_12") > 0,
          round(((col("ssr_p") - col("ssr_12")) / lit(2.0)) /
            (col("ssr_12") / (col("n") - lit(4)).cast("double")), 6))
          .as("f"))
  }

  /** Maximum drawdown per key over an integral series ordered by
    * `tCol`: dd_t = (running max of v) − v_t; reports the largest dd
    * with its trough pinned by (dd desc, t) — all integers, one
    * ordered window + one rank window, no self-join. The worst
    * peak-to-trough drop of a daily metric — the SPC-adjacent "how
    * bad did it get" card.
    * Output: (key, n, max_drawdown, trough_t).
    */
  def maxDrawdown(df: DataFrame, keyCol: String, tCol: String,
      vCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("k"),
      col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v"))
    val wo = Window.partitionBy("k").orderBy("t")
    val dd = base.withColumn("dd", max("v").over(wo) - col("v"))
    val wr = Window.partitionBy("k").orderBy(col("dd").desc, col("t"))
    dd.withColumn("rk", row_number().over(wr)).filter(col("rk") === 1)
      .join(base.groupBy("k").agg(count(lit(1)).as("n")), Seq("k"))
      .select(col("k").as(keyCol), col("n"),
        col("dd").as("max_drawdown"), col("t").as("trough_t"))
  }

  /** Rescaled-range (R/S) Hurst estimate per key: the series (ordered
    * by `tCol`, positions renumbered 1..T) splits into full segments
    * of sizes `sizes`; per segment, R/S = (max Z − min Z) /
    * √(m·Σv² − (Σv)²) where Z is the cumulative sum of the
    * m-scaled deviations Yᵢ = m·vᵢ − Σv — EVERY numerator quantity an
    * exact integer (the m-scaling clears the mean's fraction), the
    * sqrt the only libm call. Per-size means quantize to millionths;
    * with sizes (m, 2m, 4m) the log-log slope collapses to
    * H = log₂(rs_{4m}/rs_m)/2 (equally spaced in ln 2), one
    * fixed-shape expression. Output: (key, rs<m>·3, hurst). H ≈ 0.5 for
    * iid noise, > 0.5 persistent, < 0.5 mean-reverting.
    */
  def hurstRs(df: DataFrame, keyCol: String, tCol: String,
      vCol: String, sizes: Seq[Int] = Seq(4, 8, 16)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sizes.length == 3 && sizes(1) == sizes(0) * 2 &&
      sizes(2) == sizes(1) * 2, "sizes must be (m, 2m, 4m)")
    val base = df.select(col(keyCol).as("k"),
        col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("k").orderBy("t")))
    val sess = df.sparkSession
    import sess.implicits._
    val seg = base.crossJoin(sizes.map(_.toLong).toDF("m"))
      .withColumn("chunk", expr("(rn - 1) div m"))
    val wc = Window.partitionBy("k", "m", "chunk")
    val wz = wc.orderBy("rn")
    val scored = seg
      .withColumn("cnt", count(lit(1)).over(wc))
      .filter(col("cnt") === col("m"))
      .withColumn("sm", sum("v").over(wc))
      .withColumn("svv", sum(col("v") * col("v")).over(wc))
      .withColumn("z", sum(col("m") * col("v") - col("sm")).over(wz))
      .groupBy("k", "m", "chunk")
      .agg((max("z") - min("z")).as("r"),
        first(expr("m * svv - sm * sm")).as("den"))
      .filter(col("den") > 0)
      .select(col("k"), col("m"),
        floor(col("r").cast("double") / sqrt(col("den").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long").as("rsq"))
    val means = scored.groupBy("k", "m")
      .agg(count(lit(1)).as("nseg"), sum("rsq").as("s"))
      .select(col("k"), col("m"),
        (col("s").cast("double") / col("nseg").cast("double") / lit(1e6))
          .as("rs"))
    val wide = sizes.map(m => means.filter(col("m") === m)
        .select(col("k"), col("rs").as(s"rs$m")))
      .reduce((a, b) => a.join(b, Seq("k")))
    wide.select(Seq(col("k").as(keyCol)) ++
      sizes.map(m => round(col(s"rs$m"), 6).as(s"rs$m")) :+
      round(log2(col(s"rs${sizes(2)}") / col(s"rs${sizes(0)}"))
        / lit(2.0), 6).as("hurst"): _*)
  }

  /** SAX motif counts per key: z-normalize the ordered integral series
    * against its own exact moments, discretize into 4 symbols at the
    * standard gaussian breakpoints (±0.6745, 0), slide a 3-symbol
    * window (lead×2), count words, keep the top `k` per key pinned by
    * (count desc, word). The z-scores are one fixed-shape double
    * expression over exact integer moments, so the symbol boundaries
    * compare identically across engines. Output:
    * (key, word, n_occurrences, rank).
    */
  def saxMotifs(df: DataFrame, keyCol: String, tCol: String,
      vCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("kk"),
      col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v"))
    val mo = base.groupBy("kk").agg(count(lit(1)).as("n"),
      sum("v").as("s1"), sum(col("v") * col("v")).as("s2"))
    val nd = col("n").cast("double")
    val z = ((col("v").cast("double") - col("s1").cast("double") / nd) /
      sqrt((nd * col("s2").cast("double")
        - col("s1").cast("double") * col("s1").cast("double")) /
        (nd * nd)))
    val sym = base.join(mo, Seq("kk"))
      .select(col("kk"), col("t"),
        when(z < -0.6745, "a").when(z < 0.0, "b")
          .when(z < 0.6745, "c").otherwise("d").as("s"))
    val wo = Window.partitionBy("kk").orderBy("t")
    val words = sym
      .withColumn("w", concat(col("s"), lead("s", 1).over(wo),
        lead("s", 2).over(wo)))
      .filter(col("w").isNotNull && length(col("w")) === 3)
      .groupBy("kk", "w").agg(count(lit(1)).as("n_occurrences"))
    val wr = Window.partitionBy("kk")
      .orderBy(col("n_occurrences").desc, col("w"))
    words.withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("kk").as(keyCol), col("w").as("word"),
        col("n_occurrences"), col("rank"))
  }

  /** Fixed-frequency periodogram via quantized trig tables: for each
    * period p in `periods`, power_p = C² + S² with C = Σ v'_t·cos(2πt/p)
    * and S likewise — but the cos/sin values come from a LITERAL table
    * (r → ⌊cos(2πr/p)·10⁶⌉ for r = t mod p) built once driver-side and
    * shared verbatim with any oracle, so no libm runs at query time
    * and C/S are EXACT integer sums (the q274 shared-literal-table
    * discipline). v' = v − ⌊Σv/n⌋ removes the DC component FIRST (as
    * an integer, keeping the sums exact): without it, any period that
    * doesn't divide the series length leaks mean energy that swamps
    * the true cyclic signal. One small-table join + one grouped sum
    * per key. Output: (key, period, cq_sum, sq_sum, power) — the
    * integer sums value-check exactly; power is the only float.
    */
  def periodogram(df: DataFrame, keyCol: String, tCol: String,
      vCol: String, periods: Seq[Int]): DataFrame = {
    val scale = 1000000L
    val table = periods.flatMap { p =>
      (0 until p).map { r =>
        val a = 2.0 * math.Pi * r / p
        (p.toLong, r.toLong,
          math.floor(math.cos(a) * scale + 0.5).toLong,
          math.floor(math.sin(a) * scale + 0.5).toLong)
      }
    }
    val s = df.sparkSession
    import s.implicits._
    val tab = table.toDF("p", "r", "cq", "sq")
    val base0 = df.select(col(keyCol).as("k"),
      col(tCol).cast("long").as("t"), col(vCol).cast("long").as("v"))
    val mean = base0.groupBy("k")
      .agg(expr("sum(v) div count(1)").as("mu"))
    val base = base0.join(mean, Seq("k"))
      .select(col("k"), col("t"), (col("v") - col("mu")).as("v"))
    base.join(tab, pmod(col("t"), col("p")) === col("r"))
      .groupBy("k", "p")
      .agg(sum(col("v") * col("cq")).as("cq_sum"),
        sum(col("v") * col("sq")).as("sq_sum"),
        sum(col("v") * col("v")).as("svv"),
        count(lit(1)).as("n"))
      .select(col("k").as(keyCol), col("p").as("period"),
        col("cq_sum"), col("sq_sum"),
        // power as the FRACTION of series energy at this frequency —
        // an O(1) number. An absolute power here is ~1e9+ and a 6-dp
        // round of that needs more significand than a double has, so
        // the last digit diverges across engines (the repo's
        // large-double rounding class); the exact integer sums carry
        // the full-precision value, the fraction is the readable one
        round((col("cq_sum").cast("double") / lit(1e6)
            * (col("cq_sum").cast("double") / lit(1e6))
          + col("sq_sum").cast("double") / lit(1e6)
            * (col("sq_sum").cast("double") / lit(1e6)))
          / (col("n").cast("double") * col("svv").cast("double")), 6)
          .as("power"))
  }

  /** The literal trig table as SQL VALUES rows — the oracle's half of
    * [[periodogram]]'s shared-table contract. */
  def periodogramTableSql(periods: Seq[Int]): String = {
    val scale = 1000000L
    periods.flatMap { p =>
      (0 until p).map { r =>
        val a = 2.0 * math.Pi * r / p
        s"($p, $r, ${math.floor(math.cos(a) * scale + 0.5).toLong}, " +
          s"${math.floor(math.sin(a) * scale + 0.5).toLong})"
      }
    }.mkString(", ")
  }


  /** Kleinberg 2-state burst detection (Kleinberg 2002) per key: a
    * Viterbi DP over the ordered count series with a base state
    * (rate λ₀ = series mean) and a burst state (λ₁ = 2λ₀), transition
    * cost γ to ENTER the burst. Emission costs λ_s − c·ln λ_s (the
    * Poisson NLL with the shared ln c! dropped — it cancels between
    * states) quantize to 1e-9 longs BEFORE the fold, so the DP runs in
    * pure integers: the argmin path — and therefore the burst-day
    * count — is bit-deterministic however the engines' ln() differs in
    * the last ulp. The fold carries a 4-long ARRAY accumulator
    * [c0, days0, c1, days1] (arrays rebuild atomically from the old
    * accumulator in every engine, unlike struct field-by-field
    * updates — the holt hazard). One grouped collect + codegen'd fold
    * per key; series are bounded (daily grids). Output:
    * (key, n_days, n_burst_days, min_cost).
    */
  def kleinbergBurst(df: DataFrame, keyCol: String, tCol: String,
      cCol: String, gammaQ: Long = 1000000000L): DataFrame = {
    val base = df.select(col(keyCol).as("k"),
      col(tCol).cast("long").as("t"), col(cCol).cast("long").as("c"))
    val mo = base.groupBy("k").agg(count(lit(1)).as("n"),
      sum("c").as("s"))
    val lam0 = col("s").cast("double") / col("n").cast("double")
    val lam1 = lam0 * 2.0
    val days = base.join(mo, Seq("k"))
      .select(col("k"), col("n"),
        array(col("t"),
          floor((lam0 - col("c").cast("double") * log(lam0)) * lit(1e9)
            + lit(0.5)).cast("long"),
          floor((lam1 - col("c").cast("double") * log(lam1)) * lit(1e9)
            + lit(0.5)).cast("long")).as("row"))
    val packed = days.groupBy("k", "n")
      .agg(sort_array(collect_list(col("row"))).as("s"))
    def a(acc: Column, i: Int): Column = element_at(acc, i)
    val g = lit(gammaQ)
    val st = aggregate(
      slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))),
      array(element_at(element_at(col("s"), 1), 2), lit(0L),
        g + element_at(element_at(col("s"), 1), 3), lit(1L)),
      (acc, x) => array(
        least(a(acc, 1), a(acc, 3)) + element_at(x, 2),
        when(a(acc, 1) <= a(acc, 3), a(acc, 2)).otherwise(a(acc, 4)),
        least(a(acc, 1) + g, a(acc, 3)) + element_at(x, 3),
        when(a(acc, 1) + g <= a(acc, 3), a(acc, 2)).otherwise(a(acc, 4))
          + lit(1L)))
    packed.select(col("k"), col("n"), st.as("f"))
      .select(col("k").as(keyCol), col("n").as("n_days"),
        when(element_at(col("f"), 1) <= element_at(col("f"), 3),
          element_at(col("f"), 2)).otherwise(element_at(col("f"), 4))
          .as("n_burst_days"),
        round(least(element_at(col("f"), 1), element_at(col("f"), 3))
          .cast("double") / lit(1e9), 6).as("min_cost"))
  }

  private val DecTotals = org.apache.spark.sql.types.DecimalType(28, 6)
  /** Theil–Sen robust trend: per group, the MEDIAN of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i), x_i < x_j — the classic
    * outlier-resistant alternative to OLS (public method, Sen 1968).
    * Scale contract: the pair join is WITHIN a group on a bounded
    * domain (calendar months here — |pairs| ≤ |months|²/2 per group,
    * fixed by the calendar, not the data volume), and the exact median
    * runs in a window PARTITIONED by the group — no global sort, no
    * unbounded partition. Even-count medians average the two middle
    * values (matching DuckDB's `median` interpolation for the oracle).
    */
  def theilSen(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("g"), col(xCol).as("x1"),
      col(yCol).as("y1"))
    val b = df.select(col(groupCol).as("g"), col(xCol).as("x2"),
      col(yCol).as("y2"))
    val slopes = a.join(b, Seq("g")).where(col("x2") > col("x1"))
      .select(col("g"),
        ((col("y2") - col("y1")).cast("double")
          / (col("x2") - col("x1")).cast("double")).as("slope"))
    val w = Window.partitionBy("g").orderBy("slope")
    val ranked = slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("g")))
    // `/` is double division in Spark SQL — floor() both middle picks
    // (odd n: both land on the same row; even n: the two middles)
    val mid = ranked.where(
      col("rn") === floor((col("cnt") + 1) / 2) ||
      col("rn") === floor(col("cnt") / 2) + 1)
    mid.groupBy(col("g").as(groupCol))
      .agg(max("cnt").as("n_pairs"), avg("slope").as("sen_slope"))
      .select(col(groupCol), col("n_pairs").cast("long").as("n_pairs"),
        col("sen_slope"))
  }
}
