package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969)
  * — the classical model behind every production entity-resolution
  * stack: per-field agreement probabilities m = P(agree | match) and
  * u = P(agree | non-match) estimated from LABELED candidate pairs,
  * turned into log₂ match weights, and applied to score every
  * agreement pattern.
  *
  * Scale shape: the caller supplies BLOCKED candidate pairs (the
  * standard FS deployment — blocking bounds the pair count; all-pairs
  * never materializes). Everything after is one aggregation of the
  * pairs down to the 2^F agreement-pattern census (F = field count,
  * tiny), from which m/u and the weights derive by pure arithmetic on
  * a broadcast one-row frame — no second pass over the pairs, no
  * driver loop.
  */
object Linkage {

  /** Per-pattern Fellegi–Sunter decision table from labeled candidate
    * pairs: one row per observed agreement pattern with its pair
    * count, labeled-match count, empirical posterior, and the FS score
    * Σ_k agree_k ? log₂(m_k/u_k) : log₂((1−m_k)/(1−u_k)).
    *
    * `pairs` needs one boolean column per compared field (`agreeCols`)
    * plus the boolean label `matchCol`. m/u are Laplace-smoothed by
    * one pair ((x+1)/(n+2)) so degenerate fields (always/never agree)
    * keep finite weights. Scores and posteriors are 6-dp doubles; all
    * counts exact BIGINTs.
    */
  def fellegiSunter(pairs: DataFrame, matchCol: String,
      agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty)
    val census = pairs.groupBy(agreeCols.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col(matchCol), 1L).otherwise(0L)).as("n_match"))
    // field-level m/u sums derive from the census itself — the pairs
    // are touched exactly once
    val muAggs = agreeCols.flatMap { c =>
      Seq(
        sum(when(col(c), col("n_match")).otherwise(0L)).as(s"am_$c"),
        sum(when(col(c), col("n_pairs") - col("n_match")).otherwise(0L))
          .as(s"au_$c"))
    } ++ Seq(sum(col("n_match")).as("tm"),
      sum(col("n_pairs") - col("n_match")).as("tu"))
    val mu = census.agg(muAggs.head, muAggs.tail: _*)
    val scored = census.crossJoin(broadcast(mu))
    def m(c: String) = (col(s"am_$c") + 1).cast("double") /
      (col("tm") + 2).cast("double")
    def u(c: String) = (col(s"au_$c") + 1).cast("double") /
      (col("tu") + 2).cast("double")
    val score = agreeCols.map { c =>
      when(col(c), log2(m(c) / u(c)))
        .otherwise(log2((lit(1.0) - m(c)) / (lit(1.0) - u(c))))
    }.reduce(_ + _)
    scored.select(agreeCols.map(col) ++ Seq(
        col("n_pairs"), col("n_match"),
        round(col("n_match").cast("double")
          / col("n_pairs").cast("double"), 6).as("posterior"),
        round(score, 6).as("fs_score")): _*)
      .orderBy(agreeCols.map(col): _*)
  }
}
