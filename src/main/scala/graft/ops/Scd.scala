package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 construction from a changelog:
  * each change row becomes a validity interval [ts, next change ts)
  * per key, the latest row staying open (valid_to null, is_current).
  * The standard CDC -> warehouse-dimension materialization.
  *
  * One window over (key, order by ts + tie-break) — a single shuffle
  * on the key, the same cost envelope as any per-key history op; no
  * self-join (the naive interval build joins the changelog to itself).
  * The tie-break column makes simultaneous changes deterministic:
  * both rows appear, ordered, the earlier one with a zero-length
  * interval — an auditable record rather than an arbitrary winner.
  */
object Scd {
  def type2(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df.select((keyCol +: tsCol +: tieCol +: valueCols).map(col): _*)
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
  }
}
