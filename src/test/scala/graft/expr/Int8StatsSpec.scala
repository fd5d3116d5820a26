package graft.expr

import graft.TestSpark
import graft.ops.ext.Quantize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Int8StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical to the composed scale/checksum/max_err forms") {
    val rows = (1 to 150).map { i =>
      val rng = new scala.util.Random(i)
      (i.toLong, Seq.fill(32)(rng.nextDouble() * 2 - 1))
    } ++ Seq(
      (1001L, Seq.fill(8)(0.0)),             // all-zero -> scale 0
      (1002L, Seq(1e-300, -1e-300)),         // denormal-ish range
      (1003L, Seq(127.0, -127.0, 63.5)))     // exact half at the boundary
    val df = rows.toDF("id", "v")
    val mism = df.select(
      Quantize.int8Stats(col("v")).as("st"),
      Quantize.int8Scale(col("v")).as("s"),
      Quantize.int8Checksum(col("v")).as("c"),
      Quantize.int8MaxError(col("v")).as("e"))
      .filter(col("st.scale") =!= col("s") ||
        col("st.q_checksum") =!= col("c") ||
        col("st.max_err") =!= col("e"))
      .count()
    assert(mism == 0)
  }

  test("null elements and empty vectors mirror the composed coalesces") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, null, 2.0)),
      (2L, Seq.empty[java.lang.Double])).toDF("id", "v")
    val got = df.select(col("id"),
      Quantize.int8Stats(col("v")).as("st"),
      Quantize.int8Scale(col("v")).as("s"),
      Quantize.int8Checksum(col("v")).as("c"),
      Quantize.int8MaxError(col("v")).as("e"))
      .select("id", "st.scale", "st.q_checksum", "st.max_err", "s", "c", "e")
      .as[(Long, Double, Long, Double, Double, Long, Double)]
      .collect().sortBy(_._1)
    for ((id, ks, kc, ke, cs, cc, ce) <- got) {
      assert(ks == cs, s"scale for $id")
      assert(kc == cc, s"checksum for $id")
      assert(ke == ce, s"max_err for $id")
    }
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(8)
      .select(array(col("id").cast("double"), lit(2.0)).as("v"))
      .select(Quantize.int8Stats(col("v")).as("st"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("int8_stats"))
      .getOrElse(fail(plan))
    assert(line.trim.startsWith("*("), plan)
  }
}
