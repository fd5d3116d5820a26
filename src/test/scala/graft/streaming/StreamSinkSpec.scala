package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parquet file sink with checkpoint matches the batch result") {
    val src = Files.createTempDirectory("sink_src").toString
    val out = Files.createTempDirectory("sink_out").toString + "/t"
    val ckpt = Files.createTempDirectory("sink_ckpt").toString
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "k")
      .write.mode("overwrite").parquet(src)
    StreamOps.streamToParquet(spark, src, out, ckpt,
      transform = _.filter(col("k") =!= 0).withColumn("dbl", col("id") * 2))
    val got = spark.read.parquet(out)
      .select("id", "k", "dbl").as[(Long, Long, Long)].collect().toSet
    val want = (1L to 1000L).filter(_ % 7 != 0).map(i => (i, i % 7, i * 2)).toSet
    assert(got == want)
    // restart with the same checkpoint: no new data -> no duplicates
    StreamOps.streamToParquet(spark, src, out, ckpt,
      transform = _.filter(col("k") =!= 0).withColumn("dbl", col("id") * 2))
    assert(spark.read.parquet(out).count() == want.size)
  }

  test("compact resizes a many-file table without changing its rows") {
    val in = Files.createTempDirectory("compact_in").toString + "/t"
    val out = Files.createTempDirectory("compact_out").toString + "/t"
    (1L to 5000L).toDF("id").repartition(64)
      .write.mode("overwrite").parquet(in)
    val before = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    graft.io.Layout.compact(spark, in, out, targetBytes = 64L << 10)
    val after = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after < before, s"expected fewer files, got $after")
    assert(spark.read.parquet(out).as[Long].collect().toSet ==
      (1L to 5000L).toSet)
  }
}
