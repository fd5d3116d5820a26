package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audits past plain k-anonymity (q215): l-diversity of
  * a sensitive attribute within each quasi-identifier group — a
  * k-anonymous group whose members all share one sensitive value
  * still leaks it; l-diversity counts (and entropy-weighs) the
  * distinct sensitive values per group.
  *
  * Determinism: distinct-l is an exact integer; group entropy uses
  * `H = ln(n) − (Σ c·ln c)/n` where each `c·ln c` term quantizes to
  * 1e-9 fixed point BEFORE the per-group sum (order-free), and the
  * per-rollup mean quantizes each group's H to 1e-6 the same way.
  *
  * Scale shape: one hash aggregation on (QI, sensitive), one on QI,
  * one on the rollup key — pure map-side-combining aggregations, no
  * windows, no joins. QI-group skew is aggregation skew, handled by
  * partial aggregation like any groupBy.
  */
object Privacy {

  /** Per-QI-group l-diversity, rolled up per `reportCol`.
    * `df` columns: `reportCol` (rollup key, must be part of the QI),
    * `qiCols` (remaining quasi-identifiers), `sensitiveCol`.
    * Output per rollup key: n_groups, min_l, n_weak_groups
    * (distinct-l < minL), mean_entropy (nats, 6 dp).
    */
  def lDiversity(df: DataFrame, reportCol: String, qiCols: Seq[String],
      sensitiveCol: String, minL: Int = 2): DataFrame = {
    val qi = (col(reportCol) +: qiCols.map(col)) :+ col(sensitiveCol)
    val cells = df.groupBy(qi: _*).agg(count(lit(1)).as("c"))
    val groups = cells.groupBy(col(reportCol) +: qiCols.map(col): _*)
      .agg(count(lit(1)).as("l"),
        sum("c").as("n"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * 1000000000.0 + 0.5).cast("long")).as("slq"))
      .withColumn("entropy",
        log(col("n").cast("double")) -
          col("slq").cast("double") / 1000000000.0 / col("n").cast("double"))
    groups.groupBy(col(reportCol))
      .agg(count(lit(1)).as("n_groups"),
        min("l").as("min_l"),
        sum(when(col("l") < minL, 1L).otherwise(0L)).as("n_weak_groups"),
        sum(floor(col("entropy") * 1000000.0 + 0.5).cast("long")).as("seq"))
      .select(col(reportCol), col("n_groups"), col("min_l"),
        col("n_weak_groups"),
        round(col("seq").cast("double") / 1000000.0
          / col("n_groups").cast("double"), 6).as("mean_entropy"))
  }
}
