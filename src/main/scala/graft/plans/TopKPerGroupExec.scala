package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Shared per-partition pruning for the two top-k phases: a hash map
  * of group key -> bounded max-heap (size <= k) holding row COPIES
  * (iterator rows are reused buffers). A row enters its group's heap
  * only if the heap is under k or the row orders strictly before the
  * heap's current worst — so at most k rows per (partition, group)
  * ever resident, none of them sorted until final emission.
  */
private[plans] object TopKHeaps {
  def prune(iter: Iterator[InternalRow], groupProj: () => UnsafeProjection,
            ord: java.util.Comparator[InternalRow], k: Int)
      : scala.collection.mutable.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val proj = groupProj()
    val heaps =
      new scala.collection.mutable.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
    val rev = ord.reversed() // max-heap: peek() = worst kept row
    while (iter.hasNext) {
      val row = iter.next()
      val key = proj(row)
      val heap = heaps.getOrElse(key, null) match {
        case null =>
          val h = new java.util.PriorityQueue[InternalRow](k.min(16) + 1, rev)
          heaps.put(key.copy(), h)
          h
        case h => h
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
    }
    heaps
  }

  /** Heap contents in ascending `ord` order (rank order). */
  def drain(heap: java.util.PriorityQueue[InternalRow]): Array[InternalRow] = {
    val out = new Array[InternalRow](heap.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 }
    out
  }
}

/** Map-side phase: prune to k per group per input partition, emit the
  * survivors unchanged and unordered. No required distribution — runs
  * on the scan's partitioning, before any exchange.
  */
case class TopKPerGroupPartialExec(
    group: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = bindReferences(group, childOutput)
    val orderExprs = bindReferences(order, childOutput).asInstanceOf[Seq[SortOrder]]
    val kk = k
    child.execute().mapPartitions({ iter =>
      val ord = GenerateOrdering.generate(orderExprs)
      val heaps = TopKHeaps.prune(iter,
        () => UnsafeProjection.create(groupExprs), ord, kk)
      heaps.valuesIterator.flatMap(h => TopKHeaps.drain(h))
    }, preservesPartitioning = true)
  }
  private def bindReferences[E <: Expression](es: Seq[E], in: Seq[Attribute]) =
    es.map(e => BindReferences.bindReference(e, AttributeSeq(in)))
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupPartialExec = copy(child = newChild)
}

/** Reduce-side phase: requires clustering on the group key (the
  * planner inserts the hash exchange — which now carries only the
  * partial survivors), re-prunes to the true per-group top k, and
  * emits each group in order with the optional 1-based rank column
  * (IntegerType, row_number-compatible).
  */
case class TopKPerGroupFinalExec(
    group: Seq[Expression], order: Seq[SortOrder], k: Int,
    rank: Option[Attribute], child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rank
  override def producedAttributes: AttributeSet = AttributeSet(rank.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    if (group.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(group) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprs = group.map(e =>
      BindReferences.bindReference(e, AttributeSeq(childOutput)))
    val orderExprs = order.map(o =>
      BindReferences.bindReference(o, AttributeSeq(childOutput))
        .asInstanceOf[SortOrder])
    val kk = k
    val withRank = rank.isDefined
    child.execute().mapPartitions({ iter =>
      val ord = GenerateOrdering.generate(orderExprs)
      val heaps = TopKHeaps.prune(iter,
        () => UnsafeProjection.create(groupExprs), ord, kk)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(
        (childOutput ++ rank).map(_.dataType).toArray)
      heaps.valuesIterator.flatMap { h =>
        val rows = TopKHeaps.drain(h)
        if (!withRank) rows.iterator
        else rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.setInt(0, i + 1)
          toUnsafe(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupFinalExec = copy(child = newChild)
}
