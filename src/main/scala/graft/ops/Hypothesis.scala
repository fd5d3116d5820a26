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
    * Shape: BH is a rank statistic over the TESTED HYPOTHESES — one
    * sort of the p-value frame (thousands-to-millions of rows, not the
    * corpus) and one running-min window scanned from the largest p
    * down. Ties rank deterministically by `idCol`.
    */
  def bhAdjust(df: DataFrame, pCol: String, idCol: String,
      alpha: Double = 0.05): DataFrame = {
    val wRank = Window.orderBy(col(pCol), col(idCol))
    val wAll = Window.partitionBy(lit(1))
    // running min from the right = min over descending-p prefix
    val wTail = Window.orderBy(col(pCol).desc, col(idCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col("*"), row_number().over(wRank).cast("long").as("rank"),
        count(lit(1)).over(wAll).as("__n"))
      .withColumn("q_value",
        least(lit(1.0),
          min(col(pCol) * col("__n").cast("double") / col("rank"))
            .over(wTail)))
      .withColumn("significant", col("q_value") <= alpha)
      .drop("__n")
  }

  /** Pearson chi-square test of independence for two categorical
    * columns: one count aggregation, expected counts from the
    * marginals, Χ² summed through DECIMAL (order-independent), plus
    * the degrees of freedom. Output: one row
    * (chi2, dof, n, n_cells). The statistic's inputs are all BIGINT
    * counts, so every division/square is bit-identical cross-engine.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o")).persist()
    val rowT = cells.groupBy("a").agg(sum("o").as("ra"))
    val colT = cells.groupBy("b").agg(sum("o").as("cb"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("a").as("na"), countDistinct("b").as("nb"))
    val e = col("ra").cast("double") * col("cb") / col("n")
    cells
      .join(broadcast(rowT), Seq("a"))
      .join(broadcast(colT), Seq("b"))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("na"), col("nb"),
        ((col("o") - e) * (col("o") - e) / e)
          .cast(DecimalType(38, 18)).as("t"))
      .groupBy(col("n"), col("na"), col("nb"))
      .agg(round(sum(col("t")).cast("double"), 6).as("chi2"))
      .select(col("chi2"),
        ((col("na") - 1) * (col("nb") - 1)).as("dof"),
        col("n"), (col("na") * col("nb")).as("n_cells"))
  }
}
