package graft

import org.apache.spark.sql.execution.{GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Mechanized global-window audit (the round-7 verdict's ask #4): an
  * unpartitioned `Window.orderBy` serializes its whole input onto ONE
  * partition — fine above an Aggregate (the input is a reduced domain:
  * a histogram, bucket offsets, a percentile frame), a 100×-scale
  * killer above row-scale data (the q152/q268 class of bug this round
  * fixed). This spec plans EVERY declared query at sf0.001 and fails
  * if any unpartitioned WindowExec's subtree reaches data without
  * passing through an Aggregate — so the next row-scale global window
  * is a red test, not a hand-review find.
  *
  * Whitelist: query keys whose global window is over a frame this
  * static check can't see through (cached/checkpointed upstreams) but
  * whose domain reduction is hand-verified — each entry carries the
  * justification.
  */
class GlobalWindowAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  /** Keys allowed to carry an unpartitioned window whose subtree does
    * not visibly contain an Aggregate. Keep this list SHORT and each
    * entry justified — it is the audit's escape hatch.
    */
  val whitelist: Map[String, String] = Map.empty

  test("no declared query plans a row-scale unpartitioned window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, dir).queryExecution.sparkPlan
          val globals = plan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w
          }
          // a subtree is domain-reduced if the rows the window walks
          // came through an aggregation (histogram/offsets/stat frame)
          // or a bounded limit (top-k head) — both O(domain), not O(rows).
          // ScaleWindows' size gate persists its input, so the window may
          // sit above an InMemoryTableScan — traverse into the CACHED
          // plan (and any adaptive wrapper inside it) rather than
          // treating the cache boundary as an opaque leaf: the small
          // branch is admitted only when the cached subtree itself
          // reduced the domain.
          def reduced(p: SparkPlan): Boolean =
            PlanWalk.findFirst(p) {
              case _: BaseAggregateExec | _: GlobalLimitExec |
                   _: TakeOrderedAndProjectExec => true
              case _ => false
            }.isDefined
          // a ScaleWindows size-gated frame is bounded by MEASUREMENT:
          // the gate counted it at/under the small threshold before
          // taking the single-window branch (the marker rides the
          // persisted schema's metadata) — at a scale where the count
          // exceeds the threshold the two-level plan is taken instead,
          // so admitting the marker admits only runtime-proven-small
          // inputs
          def gated(p: SparkPlan): Boolean =
            PlanWalk.findFirst(p)(_.output.exists(
              _.metadata.contains(graft.ops.ScaleWindows.GateTag)))
              .isDefined
          val bad = globals.filterNot(w =>
            reduced(w.child) || gated(w.child))
          if (bad.isEmpty || whitelist.contains(name)) None
          else Some(s"$name: ${bad.size} unpartitioned window(s) not above " +
            s"an aggregate, e.g.\n${bad.head.simpleStringWithNodeId()}")
        } catch {
          case e: Throwable =>
            Some(s"$name: failed to plan — ${e.getClass.getSimpleName} ${
              Option(e.getMessage).getOrElse("").linesIterator.take(2)
                .mkString(" | ")}")
        }
    }
    assert(offenders.isEmpty,
      s"${offenders.size} queries plan a row-scale global window " +
        s"(partition it, or reduce the domain with an aggregate first; " +
        s"whitelist ONLY with a written justification):\n${
          offenders.mkString("\n")}")
  }

  test("whitelist carries no stale entries") {
    val stale = whitelist.keySet diff SparkEntry.queries.keySet
    assert(stale.isEmpty, s"whitelisted keys no longer declared: $stale")
  }
}
