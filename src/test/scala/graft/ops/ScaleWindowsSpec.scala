package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleWindows results must equal the naive unpartitioned window
  * exactly — on ties, duplicates, negatives, skewed clusters and
  * constant keys (the degenerate one-bucket case) — in BOTH branches
  * of the size gate (single-window below the threshold, two-level
  * above). The threshold is pinned via the `graft.scalewin.small`
  * system property so each branch is forced explicitly.
  */
class ScaleWindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Run `body` with the size-gate threshold pinned (suites run
    * sequentially in the forked test JVM, so the global prop is safe).
    */
  private def withThreshold[A](rows: Long)(body: => A): A = {
    val prev = sys.props.get("graft.scalewin.small")
    sys.props("graft.scalewin.small") = rows.toString
    try body
    finally {
      prev match {
        case Some(v) => sys.props("graft.scalewin.small") = v
        case None => sys.props.remove("graft.scalewin.small")
      }
      spark.catalog.clearCache()
    }
  }
  private def bothBranches(check: => Unit): Unit = {
    withThreshold(0)(check)          // force two-level
    withThreshold(1000000000)(check) // force single-window
  }

  // adversarial key sets: ties, clusters at the bucket edges, negatives
  private def frames = Seq(
    (1L to 200L).map(i => (i * 37 % 97, i)),                 // dense ties
    (1L to 200L).map(i => (if (i < 190) 5L else i * 1000, i)), // skew
    (1L to 100L).map(i => (-i * 3, i)),                      // negatives
    (1L to 50L).map(i => (42L, i))                           // constant
  ).map(_.toDF("v", "id").repartition(7))

  test("globalRowNumber equals the unpartitioned row_number") {
    bothBranches {
      frames.foreach { df =>
        val naive = df.withColumn("rn",
          row_number().over(Window.orderBy("v", "id")).cast("long"))
        val fast = ScaleWindows.globalRowNumber(df, "v", Seq("id"), "rn")
        assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
          "row numbers diverge")
      }
    }
  }

  test("globalPrefixSum equals the unpartitioned running sum") {
    bothBranches {
      frames.foreach { df =>
        val w = Window.orderBy("v", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val naive = df.withColumn("ps", sum(col("id")).over(w))
        val fast = ScaleWindows.globalPrefixSum(df, "v", Seq("id"), "id", "ps")
        assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
          "prefix sums diverge")
      }
    }
  }

  test("globalPrefixSums computes every column in one scan") {
    bothBranches {
      frames.foreach { df =>
        val in = df.withColumn("y", col("id") * 3 + 1)
        val w = Window.orderBy("v", "id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val naive = in.withColumn("ps", sum(col("id")).over(w))
          .withColumn("py", sum(col("y")).over(w))
        val fast = ScaleWindows.globalPrefixSums(in, "v", Seq("id"),
          Seq("id" -> "ps", "y" -> "py"))
        assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty,
          "multi prefix sums diverge")
      }
    }
  }

  test("globalSuffixMin equals the descending running min") {
    bothBranches {
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

  /** The round-8 verdict's task-2 plan assertion: with a continuous
    * (|domain| ≈ n) input forced onto the two-level branch, NO
    * unpartitioned window in the rank statistics' plans walks an
    * unbounded frame — each one sits above the ≤64-row `__b` bucket
    * summary. (The audit spec admits any window above an Aggregate;
    * this is the stronger guarantee for the NonParam family, whose
    * histogram aggregate itself can be row-sized.)
    */
  test("NonParam rank stats never plan an unbounded global window") {
    def unboundedGlobals(df: DataFrame): Seq[WindowExec] =
      graft.PlanWalk.collectAll(df.queryExecution.sparkPlan) {
        // bounded: the window's child aggregates BY THE BUCKET ID, so
        // its input is the ≤64-row bucket summary
        case w: WindowExec if w.partitionSpec.isEmpty =>
          w.child.collectFirst {
            case a: BaseAggregateExec if a.groupingExpressions.exists(
              _.references.exists(_.name == "__b")) => a
          }.isEmpty
        case _ => false
      }.collect { case w: WindowExec => w }
    withThreshold(0) {
      // continuous domain: every value distinct — the histogram is
      // row-sized, the exact case the two-level shape exists for
      val cont = (1L to 500L).map(i => (i * 7919 % 99991, i % 3,
        i)).toDF("x", "g", "id").repartition(5)
      val sp = NonParam.spearman(cont, "x", "id")
      val mw = NonParam.mannWhitney(cont, "x", "g", "0", "1")
      val kw = NonParam.kruskalWallis(cont, "g", "x")
      for ((name, df) <- Seq("spearman" -> sp, "mannWhitney" -> mw,
          "kruskalWallis" -> kw)) {
        val bad = unboundedGlobals(df)
        assert(bad.isEmpty,
          s"$name plans ${bad.size} unbounded global window(s):\n" +
            bad.map(_.simpleStringWithNodeId()).mkString("\n"))
      }
    }
  }
}
