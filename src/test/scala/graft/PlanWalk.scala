package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Physical-plan traversal that sees through the opaque wrappers
  * `TreeNode.collect` stops at: an `InMemoryTableScanExec` (ScaleWindows'
  * size gate persists its input) hides the cached plan behind the
  * relation, AQE hides it behind `AdaptiveSparkPlanExec`, and an
  * already-executed adaptive plan hides stages behind leaf
  * `QueryStageExec` wrappers whose subtree is a field, not a child.
  * Shared by the plan-audit specs.
  */
object PlanWalk {
  def expand(n: SparkPlan): Seq[SparkPlan] = n match {
    case m: InMemoryTableScanExec => Seq(m.relation.cachedPlan)
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec => Seq(q.plan)
    case other => other.children
  }

  /** First node (pre-order) satisfying `p`, traversing through caches
    * and adaptive wrappers.
    */
  def findFirst(root: SparkPlan)(p: SparkPlan => Boolean): Option[SparkPlan] =
    if (p(root)) Some(root)
    else expand(root).iterator.map(findFirst(_)(p)).collectFirst {
      case Some(hit) => hit
    }

  /** All nodes (pre-order) satisfying `p`, traversing through caches
    * and adaptive wrappers.
    */
  def collectAll(root: SparkPlan)(p: SparkPlan => Boolean): Seq[SparkPlan] =
    (if (p(root)) Seq(root) else Seq.empty) ++
      expand(root).flatMap(collectAll(_)(p))
}
