package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust model fitting by deterministic consensus: RANSAC-style line
  * estimation where the candidate set is a hash-free, id-selected
  * point sample (RNG would break cross-engine replay) and the winner
  * is the candidate with the most inliers, ties broken by candidate
  * point ids.
  *
  * Scale shape: candidates are a tiny frame (sample² pairs) BROADCAST
  * onto one scan of the fact table — the inlier count is a
  * broadcast-nested-loop with a bounded small side, the same
  * broadcast-scalar cross-join pattern as the hypothesis tests. No
  * per-candidate rescan; one pass counts all candidates at once.
  * Only integers aggregate (inlier counts); slope/intercept are
  * per-candidate scalars computed once.
  */
object Robust {

  /** RANSAC line fit. `df`: (x: Double, y: Double) plus `idCol` used
    * both for the deterministic candidate sample (the first
    * `sampleLimit` ids with `id % sampleMod == 0` — scale-free: the
    * candidate count stays bounded however large the corpus) and
    * tie-breaks. Candidates are all sample pairs with distinct x; a
    * point is an inlier when |y − (a + b·x)| ≤ tol. Output: top
    * `keep` candidates by (inliers desc, pid, qid).
    */
  def ransacLine(df: DataFrame, idCol: String, sampleMod: Long,
      sampleLimit: Int, tol: Double, keep: Int): DataFrame = {
    val pts = df.select(col(idCol).as("id"), col("x"), col("y"))
    val sample = pts.filter(col("id") % sampleMod === 0)
      .orderBy("id").limit(sampleLimit)
    val cands = sample.select(col("id").as("pid"), col("x").as("x1"),
        col("y").as("y1"))
      .crossJoin(sample.select(col("id").as("qid"), col("x").as("x2"),
        col("y").as("y2")))
      .filter(col("pid") < col("qid"))
      // the divide rides inside a when() guard: Catalyst fuses this
      // projection into the nested-loop join consume, where an
      // unguarded ANSI divide would fire on the x1 == x2 rows the
      // filter is about to drop
      .withColumn("slope", when(col("x1") =!= col("x2"),
        (col("y2") - col("y1")) / (col("x2") - col("x1"))))
      .filter(col("slope").isNotNull)
      .select(col("pid"), col("qid"), col("slope"),
        (col("y1") - col("slope") * col("x1")).as("icept"))
    val counted = pts.crossJoin(broadcast(cands))
      .filter(abs(col("y") - (col("icept") + col("slope") * col("x")))
        <= tol)
      .groupBy("pid", "qid", "slope", "icept")
      .agg(count(lit(1)).as("n_inliers"))
    val total = pts.agg(count(lit(1)).as("n_total"))
    counted.crossJoin(broadcast(total))
      .orderBy(col("n_inliers").desc, col("pid"), col("qid"))
      .limit(keep)
      .select(col("pid"), col("qid"), round(col("slope"), 6).as("slope"),
        round(col("icept"), 6).as("icept"), col("n_inliers"),
        round(col("n_inliers").cast("double")
          / col("n_total").cast("double"), 6).as("inlier_rate"))
  }

  /** Pairwise-difference robust scale (the Qn idea at its exact core):
    * per group, the LOWER median of all |xᵢ − xⱼ| over i < j — a
    * 50%-breakdown scale estimate that needs no location estimate
    * first (unlike MAD). Pair generation is O(g²) PER GROUP on a
    * bounded g (the [[graft.ops.Trend.mannKendall]] contract); the
    * median is the exact integer-ranked pick over the pair frame,
    * tie-broken by the pair ids. Input must be integral. Output per
    * group: n, n_pairs, qn_scale.
    */
  def pairwiseScale(df: DataFrame, groupCol: String, valCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      col(valCol).as("v"))
    val pairs = base.as("a").join(base.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .select(col("a.g").as("g"), col("a.id").as("i"), col("b.id").as("j"),
        abs(col("a.v") - col("b.v")).as("d"))
    val w = Window.partitionBy("g").orderBy(col("d"), col("i"), col("j"))
    val ranked = pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("np",
        count(lit(1)).over(Window.partitionBy("g")))
    val med = ranked.filter(col("rn") === expr("(np + 1) div 2"))
      .select(col("g"), col("np").as("n_pairs"), col("d").as("qn_scale"))
    base.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .join(med, "g")
      .select(col("g").as(groupCol), col("n"), col("n_pairs"),
        col("qn_scale"))
  }
}