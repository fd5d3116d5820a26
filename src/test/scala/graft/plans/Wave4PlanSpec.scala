package graft.plans

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-4 operators — the 100 TB claims
  * from ARCHITECTURE.md pinned in CI.
  */
class Wave4PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("q101 BM25: df/stats broadcast, top-k is TakeOrdered not global sort") {
    val plan = planOf("q101_bm25")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be per-partition heads + merge:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 1,
      s"dfreq should broadcast back onto postings:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"the one-row stats side must broadcast:\n$plan")
  }

  test("q102 URL normalization plans no shuffle at all") {
    val plan = planOf("q102_url_normalize")
    assert(!plan.contains("Exchange"),
      s"per-row normalization must not shuffle:\n$plan")
  }

  test("q109 sparse cosine join plans no cartesian / nested-loop join") {
    val plan = planOf("q109_sparse_cosine")
    assert(!plan.contains("CartesianProduct"),
      s"inverted-index join must not be all-pairs:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"inverted-index join must stay equi:\n$plan")
  }

  test("q105 training order: single shard-partitioned window, no global sort") {
    val plan = planOf("q105_train_order")
    assert(!plan.contains("Exchange SinglePartition") &&
      !plan.contains("Exchange rangepartitioning"),
      s"per-shard window must not serialize to one partition:\n$plan")
    assert(plan.contains("Window"), s"expected a window:\n$plan")
  }

  test("q110 winsorize: bounds broadcast back onto the fact side") {
    val plan = planOf("q110_winsorize")
    assert(plan.contains("BroadcastHashJoin"),
      s"group-cardinality bounds must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"bounds join must not shuffle the fact side twice:\n$plan")
  }

  test("q111 fuzzy join is a blocked equi-join, never nested-loop") {
    val plan = planOf("q111_fuzzy_join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep the join equi:\n$plan")
  }

  test("q115 interval union: one exchange, per-key window sort only") {
    val plan = planOf("q115_interval_union")
    assert(!plan.contains("Exchange SinglePartition") &&
      !plan.contains("Exchange rangepartitioning"),
      s"no global sort allowed:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("q116 expectations folds all row checks into one aggregate pass") {
    val plan = planOf("q116_expectations")
    // row-check branch: one scan of lineitem feeding one HashAggregate
    // pair (partial+final); orphan branch adds its own scan + anti join
    assert(plan.contains("HashAggregate"), s"expected hash agg:\n$plan")
    assert("LeftAnti".r.findAllIn(plan).size == 1,
      s"expected exactly one anti join:\n$plan")
  }

  test("q107 snapshot diff is one outer join, no extra exchanges") {
    val plan = planOf("q107_snapshot_diff")
    assert(plan.contains("FullOuter"), s"expected full-outer join:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).size == 1,
      s"diff must be exactly one wide join:\n$plan")
  }
}
