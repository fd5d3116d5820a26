package graft.plans

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-7 additions: the TPC-H Q7/Q8/Q9
  * reporting shapes (q384–q386), the in-row co-occurrence/association
  * rewrites, and the wave-60 pre-flights — the 100 TB claims from the
  * scaladoc pinned in CI.
  */
class Wave59to60PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }
  private def formattedPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q384 Q7 shape: nation-set filters reach the nation scans") {
    val plan = formattedPlanOf("q384_nation_volume")
    assert(plan.contains("In(n_name"),
      s"the nation IN-filter must push into the parquet scan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the either-direction predicate must stay in-stage:\n$plan")
  }

  test("q385 Q8 shape: region and part-type filters push down; one agg") {
    val plan = formattedPlanOf("q385_market_share")
    assert(plan.contains("EqualTo(r_name,ASIA)") ||
      plan.contains("IsNotNull(r_name)"),
      s"the region filter must reach its scan:\n$plan")
    assert(plan.contains("EqualTo(p_type,PROMO)"),
      s"the part-type filter must reach its scan:\n$plan")
    // numerator + denominator ride ONE aggregation over one fact pass:
    // lineitem appears exactly once in the plan
    assert("lineitem\\.parquet".r.findAllIn(plan).size <= 2,
      s"the fact must be scanned once (numerator and denominator share " +
        s"the aggregation):\n$plan")
  }

  test("q161/q236 association: no self-join on the basket key") {
    for (q <- Seq("q161_assoc_rules", "q236_freq_triples")) {
      val plan = planOf(q)
      // pairs are generated in-row from the basket array: the only
      // aggregation keyed on the basket id is the collect_set, and no
      // join condition ever references it
      assert(plan.contains("sort_array") || plan.contains("collect_set"),
        s"$q must build per-basket arrays:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$q must never be pairwise:\n$plan")
    }
  }

  test("q387 WL refinement: fixed rounds, no cartesian, no global sort") {
    val plan = planOf("q387_wl_refinement")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"refinement must stay an equi-join per round:\n$plan")
  }

  test("q389 bloom pre-flight: probe is a semi join against the bit set") {
    val plan = planOf("q389_bloom_fpr")
    assert(plan.contains("LeftSemi"),
      s"the probe must be a semi join, never a membership collect:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no pairwise probe:\n$plan")
  }
}
