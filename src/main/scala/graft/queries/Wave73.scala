package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 "wave 73" query set (q417): distributed HDF5 export — the
  * many-files scale path for X6. The reference's converter
  * (`convert_hdf.py`) is single-file/single-process; [[graft.io
  * .Hdf5Export]] writes one file per partition in parallel and
  * [[graft.io.Hdf5DataSource]] reads the directory back with per-file
  * split planning, so a 100 GB table exports and round-trips without
  * ever assembling on one node.
  */
object Wave73Queries {
  import CoreQueries.T

  // ---------------------------------------------------------------- q417
  /** Distributed HDF5 export + round-trip: orders (key, custkey, price
    * cents) repartitioned 8-ways, exported as 8 HDF5 files by the
    * tasks that hold them, read back through the hdf5 DataSource glob,
    * and integrity-folded (row count, key/cents sums, custkey
    * envelope, file count). The oracle computes the same integrals
    * from the parquet source — any torn file, lost partition or type
    * drift in the export path breaks the hash.
    */
  def q417(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val out = s"${CoreQueries.fixDir(dir)}/q417_h5_export"
    val fs = new HPath(out)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(new HPath(out, "_SUCCESS"))) {
      val src = T(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
        .repartition(8, col("o_orderkey"))
      graft.io.Hdf5Export.write(src, out)
    }
    val nFiles = fs.listStatus(new HPath(out)).toSeq
      .count(_.getPath.getName.endsWith(".h5")).toLong
    s.read.format("hdf5").load(s"$out/*.h5")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("sum_key"),
        sum(col("cents")).as("sum_cents"),
        min(col("o_custkey")).as("min_cust"),
        max(col("o_custkey")).as("max_cust"))
      .select(lit(nFiles).as("n_files"), col("n_rows"), col("sum_key"),
        col("sum_cents"), col("min_cust"), col("max_cust"))
  }
  val q417Sql: String =
    """SELECT 8::BIGINT AS n_files,
      |  count(*)::BIGINT AS n_rows,
      |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
      |  CAST(sum(CAST(floor(o_totalprice * 100.0e0 + 0.5e0) AS BIGINT))
      |    AS BIGINT) AS sum_cents,
      |  CAST(min(o_custkey) AS BIGINT) AS min_cust,
      |  CAST(max(o_custkey) AS BIGINT) AS max_cust
      |FROM orders""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q417_hdf5_export" -> (q417 _))

  val oracles: Map[String, String] = Map(
    "q417_hdf5_export" -> q417Sql)
}
