package graft.ops.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classifier evaluation — the quality-gate companion to
  * [[Retrieval.rankingMetrics]]: once a pipeline scores documents
  * (fastText-style keep/drop, nearest-centroid, a distilled reward
  * model), the curation decision needs an exact AUC against a labeled
  * eval set before the threshold ships.
  *
  * Exactness/portability construction (the repo's determinism rules):
  * AUC is the Mann–Whitney U statistic with mid-rank tie handling.
  * Ranks come from `row_number` over (score, id) — deterministic under
  * ties — and the mid-rank is carried as `min(rn)+max(rn)` per score
  * group (twice the mid-rank, an exact BIGINT), so the positive-class
  * rank sum is pure integer arithmetic until one final division.
  *
  * Scale shape: eval sets are labeled and therefore small (thousands
  * to low millions of rows — labels are the expensive resource, not
  * compute), so the global rank window is an intentional single-sort
  * design: one sort of the EVAL SET, never of the corpus. The scoring
  * side (centroid build + broadcast dot) is one corpus-scan shaped
  * pass and would scale to any corpus size; only the labeled rows
  * enter the window.
  */
object Eval {

  /** Per-dimension mean of `vecCol` over rows where `pred` holds —
    * DECIMAL(38,18) component sums (order-independent, exact), one
    * IEEE division back to double per dimension. Returns a 1-row
    * frame with the mean vector as `centv`.
    */
  def classCentroid(df: DataFrame, vecCol: String, pred: Column)
      : DataFrame =
    df.filter(pred)
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(sum(col("x").cast(DecimalType(38, 18))).as("s"),
        count(lit(1)).as("n"))
      .agg(transform(
        sort_array(collect_list(struct(col("dim"),
          (col("s").cast("double") / col("n")).as("m")))),
        e => e.getField("m")).as("centv"))

  /** Exact ROC AUC of the nearest-centroid score `dot(vec, centroid
    * of the positive class)` against `labelCol === posLabel`.
    * Output: one row (n_pos, n_neg, auc).
    */
  def centroidAuc(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, posLabel: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"),
      (col(labelCol) === posLabel).as("pos"))
    val cent = classCentroid(vecs, "vec", col("pos"))
    val scored = vecs.crossJoin(broadcast(cent))
      .select(col("id"), col("pos"),
        Similarity.dot(col("vec"), col("centv")).as("score"))
    rocAuc(scored, "score", "pos")
  }

  /** Mann–Whitney AUC of `scoreCol` against boolean `posCol`:
    * AUC = (Σ_pos midrank − n_pos(n_pos+1)/2) / (n_pos·n_neg), ties
    * at mid-rank. Integer-exact until the final division; ranks the
    * (small, labeled) eval frame in one global sort. `scored` must
    * carry an `id` column — the deterministic tie-break for the rank
    * ordering (the mid-rank construction makes the STATISTIC
    * tie-order-independent; the id only pins row numbering).
    */
  def rocAuc(scored: DataFrame, scoreCol: String, posCol: String)
      : DataFrame = {
    val rn = scored.withColumn("rn",
      row_number().over(Window.orderBy(col(scoreCol), col("id"))))
    val ws = Window.partitionBy(col(scoreCol))
    // min+max of rn per score group = 2×midrank, exact in BIGINT
    val mr = rn.withColumn("mr2",
      (min(col("rn")).over(ws) + max(col("rn")).over(ws)).cast("long"))
    mr.agg(
      sum(when(col(posCol), 1L)).as("n_pos"),
      sum(when(!col(posCol), 1L)).as("n_neg"),
      sum(when(col(posCol), col("mr2"))).as("sum2"))
      .select(col("n_pos"), col("n_neg"),
        round((col("sum2").cast("double") / 2.0
          - col("n_pos").cast("double") * (col("n_pos") + 1) / 2.0)
          / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Expected / maximum calibration error over 10 equal-width bins:
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b|, MCE = max_b |acc_b − conf_b|,
    * with bin = min(⌊p·10⌋, 9) on the 6-dp-rounded score. Per-bin
    * contributions quantize to 1e-9 longs BEFORE the cross-bin sum
    * (a 10-term double sum has engine-dependent order); MCE is a max
    * over per-bin doubles — order-free. conf comes from a DECIMAL sum
    * of the quantized scores. One groupBy + one 10-row agg. Output:
    * one row (n, n_bins, ece, mce).
    */
  def eceMce(df: DataFrame, pCol: String, posCol: String): DataFrame = {
    val b = df
      .withColumn("bin", least(floor(col(pCol) * 10).cast("long"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col(pCol).cast(DecimalType(18, 6))).as("sp"),
        sum(when(col(posCol), 1L).otherwise(0L)).as("n_pos"))
    val per = b.select(col("bin"), col("n"),
      (col("sp").cast("double") / col("n").cast("double")).as("conf"),
      (col("n_pos").cast("double") / col("n").cast("double")).as("acc"))
    per.select(col("n"),
        abs(col("acc") - col("conf")).as("gap"),
        floor(col("n").cast("double") * abs(col("acc") - col("conf"))
          * lit(1e9) + lit(0.5)).cast("long").as("qc"))
      .agg(sum("n").as("nn"), count(lit(1)).as("n_bins"),
        sum("qc").as("sq"), max("gap").as("mx"))
      .select(col("nn").as("n"), col("n_bins"),
        round(col("sq").cast("double") / lit(1e9)
          / col("nn").cast("double"), 6).as("ece"),
        round(col("mx"), 6).as("mce"))
  }

  /** Murphy decomposition of the Brier score over 10 equal-width bins:
    * brier = reliability − resolution + uncertainty, with
    * reliability = (1/N)Σ_b n_b(conf_b − acc_b)², resolution =
    * (1/N)Σ_b n_b(acc_b − ȳ)², uncertainty = ȳ(1−ȳ). The raw brier
    * (1/N)Σ(p−y)² quantizes per ROW, the bin terms per BIN — every
    * cross-row/cross-bin sum rides exact longs. Output: one row
    * (n, brier, reliability, resolution, uncertainty).
    */
  def brierDecomposition(df: DataFrame, pCol: String, posCol: String)
      : DataFrame = {
    val y = when(col(posCol), 1.0).otherwise(0.0)
    val rows = df.select(col(pCol).as("p"), col(posCol).as("pos"),
      floor((col(pCol) - y) * (col(pCol) - y) * lit(1e9) + lit(0.5))
        .cast("long").as("qb"),
      least(floor(col(pCol) * 10).cast("long"), lit(9L)).as("bin"))
    val tot = rows.agg(count(lit(1)).as("nn"), sum("qb").as("sqb"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("npos"))
      .select(col("nn"), col("sqb"),
        (col("npos").cast("double") / col("nn").cast("double")).as("ybar"))
    val bins = rows.groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast(DecimalType(18, 6))).as("sp"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("n"),
        (col("sp").cast("double") / col("n").cast("double")).as("conf"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("acc"))
    val terms = bins.crossJoin(tot.select("ybar"))
      .select(
        floor(col("n").cast("double") * (col("conf") - col("acc"))
          * (col("conf") - col("acc")) * lit(1e9) + lit(0.5)).cast("long")
          .as("qrel"),
        floor(col("n").cast("double") * (col("acc") - col("ybar"))
          * (col("acc") - col("ybar")) * lit(1e9) + lit(0.5)).cast("long")
          .as("qres"))
      .agg(sum("qrel").as("srel"), sum("qres").as("sres"))
    tot.crossJoin(terms)
      .select(col("nn").as("n"),
        round(col("sqb").cast("double") / lit(1e9)
          / col("nn").cast("double"), 6).as("brier"),
        round(col("srel").cast("double") / lit(1e9)
          / col("nn").cast("double"), 6).as("reliability"),
        round(col("sres").cast("double") / lit(1e9)
          / col("nn").cast("double"), 6).as("resolution"),
        round(col("ybar") * (lit(1.0) - col("ybar")), 6).as("uncertainty"))
  }

  /** Krippendorff's alpha (nominal) from a (unit, category) ratings
    * frame — one row per rating, units may have any number m_u ≥ 2 of
    * ratings (fewer are dropped as unpairable). EVERYTHING reduces to
    * exact integers first: per-unit ordered disagreeing slot pairs
    * carry weight 1/(m_u−1), so each term is quantized as
    * disag_u·10⁶ div (m_u−1); the expected side is n² − Σn_c² exactly.
    * alpha = 1 − (Σ_u q_u/10⁶)·(n−1) / (n² − Σ n_c²), one fixed-shape
    * double expression. Output: one row
    * (n_units, n_ratings, n_categories, alpha).
    */
  def krippendorffAlpha(ratings: DataFrame, unitCol: String,
      catCol: String): DataFrame = {
    val r = ratings.select(col(unitCol).as("u"), col(catCol).as("c"))
    val uc = r.groupBy("u", "c").agg(count(lit(1)).as("k"))
    val units = uc.groupBy("u").agg(sum("k").as("m"),
        sum(col("k") * (col("k") - 1)).as("agree"))
      .filter(col("m") >= 2)
      .select(col("u"), col("m"),
        expr("(m * (m - 1) - agree) * 1000000L div (m - 1)").as("qd"))
    val pairable = r.join(units.select("u"), Seq("u"))
    val catTot = pairable.groupBy("c").agg(count(lit(1)).as("nc"))
    val tot = catTot.agg(sum("nc").as("n"),
      count(lit(1)).as("n_categories"),
      sum(col("nc") * col("nc")).as("snc2"))
    val dsum = units.agg(count(lit(1)).as("n_units"), sum("qd").as("sqd"))
    dsum.crossJoin(tot)
      .select(col("n_units"), col("n").as("n_ratings"),
        col("n_categories"),
        // one-category data has De = 0 (no disagreement is possible);
        // the conventional report is perfect agreement, not NaN
        when(col("n") * col("n") === col("snc2"), lit(1.0))
          .otherwise(
            round(lit(1.0) - (col("sqd").cast("double") / lit(1e6))
              * (col("n") - 1).cast("double")
              / (col("n") * col("n") - col("snc2")).cast("double"), 6))
          .as("alpha"))
  }

  /** Exact average precision (the area under the precision–recall
    * curve at relevant ranks — MAP's per-query term) per query group:
    * AP = (1/P) Σ_{k : rel_k} precision@k with ranks from
    * `row_number` over (score desc, id) — deterministic under ties.
    * Each precision term (an IEEE division of two small ints) is cast
    * to DECIMAL(38,18) BEFORE the sum (the [[Retrieval
    * .rankingMetrics]] DCG rule), so the per-group rollup is
    * order-independent and cross-engine exact. The rank window is
    * PARTITIONED by the query group — bounded by the largest labeled
    * result list, never global; labeled eval sets are small by nature
    * (same contract as [[rocAuc]]).
    *
    * Output per group: n_docs, n_rel, ap (6 dp; groups with zero
    * relevant docs report ap = 0).
    */
  def averagePrecision(scored: DataFrame, groupCol: String,
      scoreCol: String, idCol: String, relCol: String): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    val cum = Window.partitionBy(groupCol)
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rel = when(col(relCol), 1L).otherwise(0L)
    scored
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__cumrel", sum(rel).over(cum))
      .withColumn("__term",
        when(rel === 1L, (col("__cumrel").cast("double")
            / col("__rank").cast("double")).cast(DecimalType(38, 18)))
          .otherwise(lit(0.0).cast(DecimalType(38, 18))))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(rel).as("n_rel"),
        sum(col("__term")).as("__ap_sum"))
      .select(col(groupCol), col("n_docs"), col("n_rel"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(round(col("__ap_sum").cast("double")
            / col("n_rel").cast("double"), 6)).as("ap"))
  }

  /** Unbiased pass@k (Chen et al. 2021, the HumanEval estimator):
    * given per-task totals `n` (samples drawn) and `c` (samples
    * correct), pass@k = 1 − C(n−c, k)/C(n, k), computed as the
    * sequential product ∏_{i=0}^{k−1} (n−c−i)/(n−i) — numerically
    * stable (every factor ≤ 1, no factorials) and BIT-DETERMINISTIC
    * across engines: a left fold of IEEE double multiplies in a fixed
    * order, so DuckDB's `list_reduce` reproduces it exactly. When
    * n − c < k a factor hits exactly 0 and pass@k = 1 (some k-subset
    * must contain a correct sample). One narrow expression per row —
    * no shuffle, no UDF; callers filter to tasks with n ≥ max(k).
    *
    * Input: one row per task with BIGINT columns `nCol` (samples) and
    * `cCol` (correct). Adds one `pass_at_<k>` double column (6 dp)
    * per requested k.
    */
  def passAtK(tasks: DataFrame, nCol: String, cCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1))
    ks.foldLeft(tasks) { (df, k) =>
      df.withColumn(s"pass_at_$k",
        round(lit(1.0) - expr(
          s"""aggregate(sequence(0, ${k - 1}), CAST(1.0 AS DOUBLE),
             |  (acc, i) -> acc * CAST($nCol - $cCol - i AS DOUBLE)
             |                  / CAST($nCol - i AS DOUBLE))""".stripMargin),
          6))
    }
  }
}
