package graft.ops.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Leakage-safe categorical feature encoding for model training —
  * leave-one-out target statistics.
  *
  * Scale shape: ONE hash shuffle on the category (a window, not a
  * join — the per-category sum/count and the row's own value meet in
  * the same partition), then codegen'd per-row algebra. Categories of
  * any cardinality work; a skewed category is one partition's window
  * (same remedy as any skewed key: salt the heavy hitters upstream).
  *
  * Determinism: the category sum rides DECIMAL (order-free), the
  * leave-one-out subtraction stays DECIMAL-exact, and the single
  * division is double-over-integer with both operands identical on
  * any engine.
  */
object FeatureEncode {

  /** Per input row: the mean of `valueCol` over all OTHER rows of the
    * same `catCol` — the leave-one-out target encoding, null when the
    * row is its category's only member (no peer signal; callers
    * impute with the global mean if needed). Output: `idCol`,
    * `catCol`, `loo_mean` (6 dp).
    */
  def looTargetEncode(df: DataFrame, catCol: String, valueCol: String,
                      idCol: String): DataFrame = {
    val dec = DecimalType(28, 6)
    val w = Window.partitionBy(col(catCol))
    // floor-quantized 6-dp rounding, NOT round(): a 6-dp DECIMAL sum
    // divided by a power-of-two count is an exact decimal midpoint at
    // the 7th digit, where round()'s decimal-string half-up (Spark) and
    // multiply-in-binary (DuckDB) disagree by 1 ulp; floor(x·1e6 + ½)
    // is the same IEEE op sequence on both engines
    val q = (col("__s") - col("__v")).cast("double") / (col("__c") - 1)
    df.select(col(idCol), col(catCol), col(valueCol).cast(dec).as("__v"))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__c", count(lit(1)).over(w))
      .select(col(idCol), col(catCol),
        when(col("__c") > 1,
          floor(q * lit(1000000.0) + lit(0.5)).cast("double") /
            lit(1000000.0)).as("loo_mean"))
  }

  /** Weight-of-evidence / information-value profile of a categorical
    * feature against a binary label — the credit-scoring-style
    * predictive-power screen for feature selection.
    *
    * Per category c: `WoE_c = ln((g_c/G)/(b_c/B))` with the standard
    * +0.5 Laplace adjustment on every cell (so empty cells stay
    * finite), and `IV = Σ_c (g_c/G − b_c/B)·WoE_c`. Counts are exact
    * integers; each IV contribution quantizes to 1e-9 fixed point
    * before the cross-category sum, so the feature-level IV is an
    * order-free integer reconstruction. `ln` over identical IEEE
    * doubles agrees across engines at the 6-dp output grid (same
    * contract as the entropy/PMI family).
    *
    * Scale shape: one hash aggregation on (category), a scalar total
    * broadcast back, and a tiny window over categories for the IV sum
    * — the frame is one row per category from the first aggregation
    * on. Output: category, n_good, n_bad, woe, iv (feature total,
    * repeated per row).
    */
  def woeIv(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val counts = df.groupBy(col(catCol))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("n_good"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n_bad"))
    val tot = counts.agg(sum("n_good").as("tg"), sum("n_bad").as("tb"))
    val gp = (col("n_good").cast("double") + 0.5) /
      (col("tg").cast("double") + 0.5)
    val bp = (col("n_bad").cast("double") + 0.5) /
      (col("tb").cast("double") + 0.5)
    val woe = log(gp / bp)
    val w = Window.partitionBy(lit(1))
    counts.crossJoin(broadcast(tot))
      .select(col(catCol), col("n_good"), col("n_bad"),
        woe.as("woe"),
        floor((gp - bp) * woe * lit(1000000000.0) + 0.5).cast("long")
          .as("ivq"))
      .withColumn("iv",
        round(sum(col("ivq")).over(w).cast("double") / lit(1000000000.0), 6))
      .select(col(catCol), col("n_good"), col("n_bad"),
        round(col("woe"), 6).as("woe"), col("iv"))
  }
}
