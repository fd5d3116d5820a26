package graft.io

import org.apache.spark.sql.DataFrame

/** Parquet sink (SURVEY §2.1 S8): every compiled reference command targets
  * Parquet (`"command": "hot.Parquet"`, `run_annotate.py:188`, `:228`).
  *
  * Default is directory-parquet with the natural partitioning of the plan
  * — the scalable layout. `singleFile` reproduces the reference's
  * one-file-per-target shape via `coalesce(1)`; it is a compat mode only
  * (anti-scale: one task writes everything) and deliberately NOT the
  * default.
  */
object ParquetSink {

  /** @param compression parquet codec — snappy (default, cheap CPU) or
    *                     zstd (denser; at 100 TB the storage/scan-byte
    *                     savings usually win)
    */
  def write(df: DataFrame, target: String, singleFile: Boolean = false,
            partitionBy: Seq[String] = Nil,
            compression: String = "snappy"): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    val w = d.write.mode("overwrite").option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(target)
  }
}
