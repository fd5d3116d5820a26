package graft.ops

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleWindows two-level results must equal the naive unpartitioned
  * window exactly — on ties, duplicates, negatives, skewed clusters
  * and constant keys (the degenerate one-bucket case).
  */
class ScaleWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // adversarial key sets: ties, clusters at the bucket edges, negatives
  private def frames = Seq(
    (1L to 200L).map(i => (i * 37 % 97, i)),                 // dense ties
    (1L to 200L).map(i => (if (i < 190) 5L else i * 1000, i)), // skew
    (1L to 100L).map(i => (-i * 3, i)),                      // negatives
    (1L to 50L).map(i => (42L, i))                           // constant
  ).map(_.toDF("v", "id").repartition(7))

  test("globalRowNumber equals the unpartitioned row_number") {
    frames.foreach { df =>
      val naive = df.withColumn("rn",
        row_number().over(Window.orderBy("v", "id")).cast("long"))
      val fast = ScaleWindows.globalRowNumber(df, "v", Seq("id"), "rn")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        "row numbers diverge")
    }
  }

  test("globalPrefixSum equals the unpartitioned running sum") {
    frames.foreach { df =>
      val w = Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = df.withColumn("ps", sum(col("id")).over(w))
      val fast = ScaleWindows.globalPrefixSum(df, "v", Seq("id"), "id", "ps")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        "prefix sums diverge")
    }
  }

  test("globalSuffixMin equals the descending running min") {
    frames.foreach { df =>
      val withVal = df.withColumn("x", pmod(col("id") * 31, lit(101L)))
      val w = Window.orderBy(col("v").desc, col("id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val naive = withVal.withColumn("sm", min(col("x")).over(w))
      val fast = ScaleWindows
        .globalSuffixMin(withVal, "v", Seq("id"), "x", "sm")
      assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
        "suffix mins diverge")
    }
  }
}
