package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Per-group top-k as a first-class plan operator.
  *
  * The standard Spark idiom — `row_number().over(partitionBy(g).orderBy(o))`
  * then `filter(rank <= k)` — shuffles and SORTS every row of every
  * group before discarding all but k per group. At 100 TB that sort is
  * the bill. This operator is the aggregation-style two-phase shape
  * instead:
  *
  *   partial (map side): one bounded heap per group per partition —
  *     at most k rows per (partition, group) survive, no sort;
  *   exchange: hash-partition ONLY those survivors by the group key
  *     (<= k * partitions rows per group, vs the group's full size);
  *   final (reduce side): re-prune to k per group, emit in group-local
  *     order with an optional row_number-compatible rank column.
  *
  * Same plan family as TakeOrderedAndProject (Spark's GLOBAL top-k),
  * generalized per-group. Memory: each task holds |groups in task| * k
  * row copies — the same envelope as hash aggregation buffers, the
  * trade that makes the no-sort shape possible (k is validated small).
  *
  * Ties on the ordering are broken arbitrarily, exactly like
  * row_number over a non-total order; callers wanting determinism
  * tie-break the ordering (all graft queries do).
  *
  * `GraftTopKRule` rewrites the window idiom into this operator
  * automatically (the rank attribute keeps its exprId, so downstream
  * references — including a projected-away rank — stay resolved);
  * `graft.ops.TopK.perGroup` is the direct API.
  */
case class TopKPerGroupPlan(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rank: Option[Attribute],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output ++ rank
  override def producedAttributes: AttributeSet = AttributeSet(rank.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroupPlan = copy(child = newChild)
}

/** Plans the logical node as partial -> (exchange via the final node's
  * required distribution) -> final.
  */
object GraftTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(group, order, k, rank, child) =>
      val partial = TopKPerGroupPartialExec(group, order, k, planLater(child))
      TopKPerGroupFinalExec(group, order, k, rank, partial) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(rank <= k)` over `Window[row_number() OVER
  * (PARTITION BY g ORDER BY o)]` — the ubiquitous top-k-per-group
  * idiom — into [[TopKPerGroupPlan]]. Fires only on the exact shape
  * (single row_number window expression, default row frame, a bare
  * rank-vs-literal comparison, non-empty partition spec) and only for
  * k small enough for the heap envelope; anything else keeps the
  * general window plan.
  */
object GraftTopKRule extends Rule[LogicalPlan] {
  private val MaxK = 10000

  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.semanticEquals(rank) => Some(1)
      case _ => None
    }

  private object RowNumberWindow {
    def unapply(e: NamedExpression): Option[Alias] = e match {
      case a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(_, _, SpecifiedWindowFrame(
            org.apache.spark.sql.catalyst.expressions.RowFrame,
            UnboundedPreceding, CurrentRow))), _) => Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(RowNumberWindow(alias)), part, order, child, _))
        if part.nonEmpty && order.nonEmpty && !w.isStreaming =>
      rankLimit(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && k <= MaxK =>
          TopKPerGroupPlan(part, order, k, Some(alias.toAttribute), child)
        case _ => f
      }
  }
}
