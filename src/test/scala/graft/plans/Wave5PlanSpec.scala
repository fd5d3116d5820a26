package graft.plans

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the evaluation/statistics wave — the
  * 100 TB claims from ARCHITECTURE.md pinned in CI.
  */
class Wave5PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q134 AUC: the class centroid broadcasts onto one corpus scan") {
    val plan = planOf("q134_auc")
    assert(plan.contains("BroadcastExchange"),
      s"1-row centroid must broadcast, not shuffle the corpus:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"scoring must stay a broadcast pass:\n$plan")
  }

  test("q136 skyline: bucket prune broadcasts, no all-pairs dominance join") {
    val plan = planOf("q136_pareto_frontier")
    assert(plan.contains("BroadcastExchange"),
      s"the tiny bucket running-max frame must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"dominance must never be pairwise:\n$plan")
  }

  test("q137 perceptual dedup: band join stays equi, never nested-loop") {
    val plan = planOf("q137_image_phash_dedup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"hamming candidates must come from the band equi-join:\n$plan")
  }

  test("q139 chi-square: full r×c table joins cells via broadcast") {
    val plan = planOf("q139_chi_square")
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftOuter"),
      s"observed cells must broadcast-left-join the marginal grid:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"),
      s"the tiny marginal/totals sides must broadcast:\n$plan")
  }

  test("q140 group OLS: one hash aggregation, no window or global sort") {
    val plan = planOf("q140_group_ols")
    assert(!plan.contains("Window"),
      s"moments must come from aggregation, not windows:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"the grouped agg must stay parallel:\n$plan")
  }

  test("q145 overlap matrix: n-gram self-join is equi, totals broadcast") {
    val plan = planOf("q145_overlap_matrix")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the source-pair fan-out must ride the n-gram equi-join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"per-source totals must broadcast:\n$plan")
  }
}
