package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Distributed HDF5 export: one HDF5 file PER PARTITION, written by the
  * task that holds the partition — the many-files scale path for S11/X6
  * (cf. reference `convert_hdf.py`: single-file, single-process; a
  * 100 GB table cannot assemble on one node, but 800 × 128 MB files
  * write in parallel and read back through [[Hdf5DataSource]]'s glob +
  * per-file split planning).
  *
  * Layout: `<dir>/part-NNNNN.h5`, each holding one rank-1 dataset per
  * column (column names = dataset names; I32/I64/F32/F64 from the
  * Spark type), plus a driver-written `_SUCCESS` marker. Empty
  * partitions write no file. Each task encodes to a writer-unique temp
  * file and renames into place, so a speculative twin can never leave a
  * torn file; the loser deletes its temp.
  *
  * Sizing contract: one partition = one in-memory columnar buffer =
  * one file — size partitions to the usual 100-500 MB with
  * `repartition`/`maxPartitionBytes` exactly as for parquet output.
  */
object Hdf5Export {

  import Hdf5Writer.{Ds, DType, F32, F64, I32, I64}

  private def dtypeFor(f: StructField): DType = f.dataType match {
    case LongType => I64
    case IntegerType => I32
    case DoubleType => F64
    case FloatType => F32
    case other => throw new IllegalArgumentException(
      s"hdf5 export supports int/long/float/double columns; " +
        s"'${f.name}' is $other")
  }

  /** Writes `df` under `dir` (one .h5 per non-empty partition) and
    * returns the number of files written. Null values are rejected
    * (HDF5 scalar datasets have no null notion).
    */
  def write(df: DataFrame, dir: String): Int = {
    val fields = df.schema.fields
    val dtypes = fields.map(dtypeFor) // validates the schema up front
    val names = fields.map(_.name)
    val fs = new HPath(dir).getFileSystem(new Configuration())
    fs.mkdirs(new HPath(dir))
    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      // re-derive per-partition state (closures ship names + dtypes)
      val dts: Array[DType] = dtypes
      val nCols = dts.length
      val longs = Array.fill(nCols)(new scala.collection.mutable.ArrayBuilder.ofLong)
      val dbls = Array.fill(nCols)(new scala.collection.mutable.ArrayBuilder.ofDouble)
      var n = 0
      rows.foreach { row =>
        var c = 0
        while (c < nCols) {
          require(!row.isNullAt(c),
            s"null in column '${names(c)}' — hdf5 export is non-nullable")
          dts(c) match {
            case I64 => longs(c) += row.getLong(c)
            case I32 => longs(c) += row.getInt(c).toLong
            case F64 => dbls(c) += row.getDouble(c)
            case F32 => dbls(c) += row.getFloat(c).toDouble
          }
          c += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty
      else {
        val dss = (0 until nCols).map { c =>
          val data: AnyRef = dts(c) match {
            case I64 | I32 => longs(c).result()
            case F64 | F32 => dbls(c).result()
          }
          Ds(names(c), dts(c), Seq(n), data)
        }
        val bytes = Hdf5Writer.encode(dss)
        val f = new HPath(dir).getFileSystem(new Configuration())
        val target = new HPath(dir, f"part-$pid%05d.h5")
        val tmp = new HPath(dir,
          f".part-$pid%05d.${System.nanoTime().toHexString}.tmp")
        val out = f.create(tmp, false)
        try out.write(bytes) finally out.close()
        if (!f.rename(tmp, target)) f.delete(tmp, false) // speculative loser
        Iterator.single(1)
      }
    }.sum().toInt
    val ok = fs.create(new HPath(dir, "_SUCCESS"), true)
    ok.close()
    written
  }
}
