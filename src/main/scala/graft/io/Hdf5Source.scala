package graft.io

import graft.io.Hdf5Format.{H5Dataset, H5Float, H5Int}
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
  * Scale shape: HDF5 is not splittable without the library, so the unit
  * of parallelism is the FILE — the file list is distributed and each
  * task decodes whole files ([[Hdf5Format]] is a plain serializable
  * decoder over byte arrays). 100 TB of HDF5 = many files; one task
  * each, read via Hadoop FS (works against object stores), no driver
  * bottleneck beyond listing. A single huge file is the degenerate case
  * and is documented as such.
  */
object Hdf5Source {

  def schemaFor(dss: Seq[H5Dataset]): StructType =
    StructType(dss.map { d =>
      val scalar = d.dtype match {
        case H5Int(_, _) => LongType
        case H5Float(_) => DoubleType
      }
      val t = if (d.dims.size <= 1) scalar else ArrayType(scalar, false)
      StructField(d.name, t, nullable = false)
    })

  /** Decoded datasets -> row iterator over the shared leading dim. */
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

  private def decodePath(path: String, conf: Configuration)
      : Seq[H5Dataset] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len < Int.MaxValue, s"HDF5 file too large for one task: $path")
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](len.toInt)
      in.readFully(0, bytes)
      Hdf5Format.parse(bytes)
    } finally in.close()
  }

  /** Read one or many HDF5 files into a DataFrame (schema from the
    * first file; remaining files decoded in parallel on executors).
    */
  def readToDataFrame(spark: SparkSession, paths: Seq[String],
                      select: Seq[String] = Nil): DataFrame = {
    require(paths.nonEmpty, "no HDF5 files to read")
    val conf = spark.sparkContext.hadoopConfiguration
    val keep: Seq[H5Dataset] => Seq[H5Dataset] =
      if (select.isEmpty) identity
      else dss => select.flatMap(n => dss.find(_.name == n))
    val schema = schemaFor(keep(decodePath(paths.head, conf)))
    // executors rebuild a default Configuration (local/HDFS defaults);
    // object-store credentials would ride spark.hadoop.* which Spark
    // injects into executor-side `new Configuration()` loads
    val rdd = spark.sparkContext
      .parallelize(paths, math.min(paths.size, 64))
      .flatMap(p => toRows(keep(decodePath(p, new Configuration()))))
    spark.createDataFrame(rdd, schema)
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
