package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application — MERGE INTO semantics without a table format:
  * apply a keyed stream of inserts/updates/deletes to a snapshot,
  * latest sequence number wins, a delete removes the key. The batch
  * core of every CDC / lakehouse-compaction pipeline.
  *
  * Scale shape: one shuffle on the key (the latest-wins window); the
  * snapshot and changelog union before the shuffle, so each key's
  * history meets exactly once. No join — deletes fall out of the same
  * window pass.
  *
  * Contract: (key, seq) pairs are unique across snapshot+changes (the
  * usual CDC log guarantee); the snapshot rows carry the lowest seq.
  */
object Cdc {

  /** Final state after applying `changes` (same data columns as
    * `snapshot`, plus `seqCol` long and `opCol` in {"U","D"} — an
    * upsert or a delete) to `snapshot` at sequence 0.
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    val base = snapshot
      .withColumn(seqCol, lit(0L))
      .withColumn(opCol, lit("U"))
    val all = base.unionByName(
      changes.select((dataCols :+ seqCol :+ opCol).map(col): _*))
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) === "U")
      .select(dataCols.map(col): _*)
  }
}
