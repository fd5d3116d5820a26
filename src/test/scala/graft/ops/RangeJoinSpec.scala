package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the naive nested-loop result, each pair exactly once") {
    val points = (0L to 200L).map(i => (i, i * 7 % 97)).toDF("pid", "p")
    val intervals = (0L to 40L).map { i =>
      val lo = i * 5 % 89; (i, lo, lo + (i % 13))
    }.toDF("ivid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        binWidth = 8)
      .select("pid", "ivid").as[(Long, Long)].collect().sorted.toSeq
    val want = points.as[(Long, Long)].collect().flatMap { case (pid, p) =>
      intervals.as[(Long, Long, Long)].collect().collect {
        case (ivid, lo, hi) if p >= lo && p <= hi => (pid, ivid)
      }
    }.sorted.toSeq
    assert(got == want)
    assert(got.size == got.distinct.size, "pair emitted more than once")
  }

  test("handles negative domains (floor, not truncate-toward-zero)") {
    val points = Seq((1L, -10L), (2L, -1L), (3L, 0L), (4L, 5L)).toDF("pid", "p")
    val intervals = Seq((1L, -12L, -9L), (2L, -2L, 1L)).toDF("ivid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        binWidth = 4)
      .select("pid", "ivid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("plans an equi-join, not a nested-loop join") {
    val points = (0L to 100L).map(i => (i, i)).toDF("pid", "p")
    val intervals = (0L to 20L).map(i => (i, i * 4, i * 4 + 6))
      .toDF("ivid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }
}
