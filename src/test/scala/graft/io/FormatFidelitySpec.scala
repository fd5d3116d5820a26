package graft.io

import graft.TestSpark
import graft.queries.PipeQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Fidelity checks for the non-parquet interchange formats beyond what
  * the q81/q82 oracles exercise: Avro's timestamp-micros logical type
  * and XML's entity escaping must round-trip values bit-for-bit.
  */
class FormatFidelitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("avro round-trips timestamps (timestamp-micros logical type)") {
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-03-01 10:15:30.123456")),
      (2L, Timestamp.valueOf("1969-12-31 23:59:59.999999")), // pre-epoch
      (3L, Timestamp.valueOf("2262-04-11 00:00:00.0")))      // past ns range
    val df = rows.toDF("id", "ts")
    val out = tmp("graft-avro-ts")
    df.write.mode("overwrite").format(PipeQueries.AvroFormat).save(out)
    val back = spark.read.format(PipeQueries.AvroFormat).load(out)
      .as[(Long, Timestamp)].collect().toSet
    assert(back == rows.toSet)
  }

  test("xml escapes markup-significant characters losslessly") {
    val rows = Seq(
      (1L, """five < six & six > five"""),
      (2L, """quotes "double" and 'single'"""),
      (3L, """an <inner>tag</inner> survives as text"""))
    val df = rows.toDF("id", "text")
    val out = tmp("graft-xml-esc")
    df.write.mode("overwrite").option("rowTag", "row")
      .format("xml").save(out)
    val back = spark.read.option("rowTag", "row").format("xml").load(out)
      .select(col("id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
  }
}
