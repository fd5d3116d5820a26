package graft.io

import graft.io.Hdf5Format.{H5Dataset, H5DatasetMeta, H5Float, H5Int}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** HDF5 -> DataFrame -> Parquet (SURVEY §2.1 S11; the north-star's
  * "DataFrame conversion from HDF to Parquet").
  *
  * Model: one HDF5 file holds N named datasets sharing their leading
  * dimension (the standard columnar-table layout) — rank-1 datasets
  * become scalar columns, rank-2 datasets become array columns (the
  * embeddings layout).
  *
  * Scale shape: reads go through the DataSource V2 connector
  * ([[Hdf5DataSource]]): chunk-aligned ROW-RANGE splits inside each
  * file (one huge file fans out across the cluster; no < 2 GiB
  * per-file ceiling) and column pruning pushed into the scan. Works
  * against any Hadoop FS (object stores included) via positioned reads.
  */
object Hdf5Source {

  def schemaForMeta(dss: Seq[H5DatasetMeta]): StructType =
    StructType(dss.map { d =>
      val scalar = d.dtype match {
        case H5Int(_, _) => LongType
        case H5Float(_) => DoubleType
      }
      val t = if (d.dims.size <= 1) scalar else ArrayType(scalar, false)
      StructField(d.name, t, nullable = false)
    })

  def schemaFor(dss: Seq[H5Dataset]): StructType =
    schemaForMeta(dss.map(d =>
      H5DatasetMeta(d.name, d.dtype, d.dims, Hdf5Format.Contiguous(0L))))

  /** Decoded datasets -> row iterator over the shared leading dim
    * (driver-side utility for small files/tests; the Spark read path is
    * [[Hdf5DataSource]], which converts to InternalRow directly).
    */
  def toRows(dss: Seq[H5Dataset]): Iterator[Row] = {
    if (dss.isEmpty) return Iterator.empty
    val n = dss.head.rows.toInt
    require(dss.forall(_.rows == n),
      s"datasets disagree on leading dimension: ${dss.map(d => d.name -> d.rows)}")
    (0 until n).iterator.map { i =>
      Row.fromSeq(dss.map { d =>
        (d.data, d.dims.size) match {
          case (a: Array[Long], 1) => a(i)
          case (a: Array[Double], 1) => a(i)
          case (a: Array[Long], _) =>
            val w = d.dims(1).toInt; a.slice(i * w, (i + 1) * w).toSeq
          case (a: Array[Double], _) =>
            val w = d.dims(1).toInt; a.slice(i * w, (i + 1) * w).toSeq
          case other => throw new IllegalStateException(s"bad data $other")
        }
      })
    }
  }

  /** Read one or many HDF5 files into a DataFrame through the DSV2
    * connector. `select` prunes datasets — the pruning also reaches the
    * scan when done later via `.select(...)`, Catalyst pushes it down.
    */
  def readToDataFrame(spark: SparkSession, paths: Seq[String],
                      select: Seq[String] = Nil): DataFrame = {
    require(paths.nonEmpty, "no HDF5 files to read")
    val df = spark.read.format("hdf5").load(paths: _*)
    if (select.isEmpty) df
    else df.select(select.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Glob variant + the end-to-end conversion. */
  def hdf5ToParquet(spark: SparkSession, inGlob: String, out: String,
                    select: Seq[String] = Nil): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(inGlob)
    val fs = p.getFileSystem(conf)
    val files = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).toSeq.sorted
    val df = readToDataFrame(spark, files, select)
    df.write.mode("overwrite").parquet(out)
    df
  }
}
