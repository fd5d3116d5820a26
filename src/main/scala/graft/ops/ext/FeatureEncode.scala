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
}
