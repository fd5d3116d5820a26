package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with
  * the greatest `ts` <= left.`ts` within the same key (the standard
  * time-series enrichment join; not built into Spark).
  *
  * Composition, per the builder's preference order (a): tag both sides,
  * UNION, one window pass with `last(..., ignoreNulls)` over
  * (key, ts, side) ordering, keep left rows. ONE shuffle on the key —
  * same cost as a regular join of the two inputs — no per-row range
  * scan, no cross product, and the window is a running carry-forward
  * (rowsBetween unbounded-preceding), so it streams within each
  * partition. Skewed keys inherit AQE handling of the single exchange.
  *
  * Inclusive semantics: a right row AT the left row's timestamp matches
  * (right sorts before left at equal ts) — same as DuckDB/pandas
  * `merge_asof` backward. Ties among right rows at the same (key, ts)
  * break deterministically to the largest payload struct.
  */
object AsOfJoin {

  /** @param rightCols right payload columns (must exist in `right`);
    *                   emitted as `<name><suffix>`
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               ts: String, rightCols: Seq[String],
               suffix: String = "_right"): DataFrame = {
    val lPayload = struct(left.columns.toIndexedSeq.map(col): _*)
    val rPayload = struct(rightCols.map(col): _*)
    val lType = left.select(lPayload).schema.head.dataType
    val rType = right.select(rPayload).schema.head.dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(col(ts).as("__ts"), lPayload.as("__lval"),
        lit(null).cast(rType).as("__rval"), lit(1).as("__side")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(ts).as("__ts"),
        lit(null).cast(lType).as("__lval"), rPayload.as("__rval"),
        lit(0).as("__side")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__rval"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = l2.unionByName(r2)
      .withColumn("__m", last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = left.columns.map(c => col(s"__lval.$c").as(c)) ++
      rightCols.map(c => col(s"__m.$c").as(s"$c$suffix"))
    matched.select(out.toSeq: _*)
  }
}
