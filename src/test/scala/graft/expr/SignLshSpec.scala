package graft.expr

import graft.TestSpark
import graft.ops.ext.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SignLshSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The historical composed-expression form SignLsh replaced — the
    * equivalence reference (hash-derived hyperplanes, per-plane fold).
    */
  private def composedBucket(vec: Column, from: Int, to: Int): Column = {
    def planeComponent(p: Int, d: Column): Column =
      (xxhash64(concat(lit(s"plane$p#"), d.cast("string"))).cast("double")
        / lit(Long.MaxValue.toDouble))
    (from until to).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p - from)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  test("bit-exact vs the composed per-plane fold, incl. banded ranges") {
    val rows = (1 to 100).map { i =>
      val rng = new scala.util.Random(i)
      (i.toLong, Seq.fill(16)(rng.nextDouble() - 0.5))
    }
    val df = rows.toDF("id", "vec")
    for ((from, to) <- Seq((0, 8), (8, 16), (0, 1), (3, 11))) {
      val mismatches = df.select(
        Similarity.lshBucketRange(col("vec"), from, to).as("native"),
        composedBucket(col("vec"), from, to).as("composed"))
        .filter(col("native") =!= col("composed")).count()
      assert(mismatches == 0, s"range [$from,$to)")
    }
  }

  test("null element zeroes the bucket, exactly like the composed form") {
    val df = Seq((1L, Seq[java.lang.Double](0.5, null, 0.25)))
      .toDF("id", "vec")
    val got = df.select(
      Similarity.lshBucketRange(col("vec"), 0, 8).as("b")).head.getLong(0)
    assert(got == 0L)
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(8)
      .select(array(col("id").cast("double"), lit(0.5)).as("vec"))
      .select(Similarity.lshBucketRange(col("vec"), 0, 8).as("b"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("sign_lsh"))
      .getOrElse(fail(plan))
    assert(line.trim.startsWith("*("), plan)
  }
}
