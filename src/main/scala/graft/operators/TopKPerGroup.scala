package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (SURVEY.md §2b preference order (c)): a
  * custom logical node + planner strategy + physical operator pair for
  * per-group top-k.
  *
  * Why not a window: `row_number().over(partitionBy(g).orderBy(o)) <= k`
  * fully sorts every group after the shuffle — O(n log n) per group and
  * the whole group materialized in the sorter. This operator keeps a
  * bounded k-heap per group on BOTH sides of the shuffle: the partial
  * exec cuts each map partition to ≤ k rows per group, so the exchange
  * carries at most k·groups·partitions rows (not n), and the final exec
  * is O(n' log k) memory-bounded by k per group. The same
  * partial → exchange → final shape as Spark's HashAggregate.
  *
  * Registered via `GraftExtensions`/`injectPlannerStrategy`; built from
  * the DataFrame API with [[TopKPerGroup.apply]].
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: SortOrder,
    k: Int,
    child: LogicalPlan,
    // a constructor field (not a body val) so plan copies during
    // analysis/optimization keep the SAME exprId for the rank column
    rankAttr: AttributeReference =
      AttributeReference("rn", IntegerType, nullable = false)())
    extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // the rank column originates HERE, not in the child — without this,
  // CheckAnalysis reports it as a missing input attribute
  override def producedAttributes
      : org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(newChild: LogicalPlan)
      : LogicalPlan = copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      TopKPerGroupFinalExec(n.groupExprs, n.order, n.k, n.rankAttr,
        TopKPerGroupPartialExec(n.groupExprs, n.order, n.k,
          planLater(n.child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pass: for each group key, retain the ≤ k rows
  * that rank first under `order`. Returns (key, sorted rows) pairs. */
private[operators] object TopKHeap {
  def perGroup(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      order: SortOrder,
      k: Int,
      childOutput: Seq[Attribute]): Iterator[(UnsafeRow, Seq[(Any, UnsafeRow)])] = {
    val groupProj = UnsafeProjection.create(groupExprs, childOutput)
    // child rows are InternalRow but not necessarily Unsafe (e.g. a
    // columnar scan boundary) — normalize before copying into the heap
    val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
    val orderExpr = BindReferences.bindReference(order.child, childOutput)
    val base = PhysicalDataType.ordering(order.child.dataType)
      .asInstanceOf[Ordering[Any]]
    val ord: Ordering[Any] =
      if (order.direction == Ascending) base else base.reverse
    // heap keeps the currently-kept rows with the WORST at the head
    val heaps = new scala.collection.mutable.HashMap[
      UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]]
    val heapOrd: Ordering[(Any, UnsafeRow)] = Ordering.by[(Any, UnsafeRow), Any](_._1)(ord)
    while (iter.hasNext) {
      val row = iter.next()
      val key = groupProj(row) // reused buffer: copy only on first sight
      // null ordering values cannot rank — excluded (the window
      // formulation would likewise need an explicit nulls-ordering
      // decision under a <=k filter)
      val v = InternalRow.copyValue(orderExpr.eval(row))
      if (v != null) {
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = new scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]()(heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < k) {
          heap.enqueue((v, toUnsafe(row).copy()))
        } else if (ord.lt(v, heap.head._1)) {
          heap.dequeue()
          heap.enqueue((v, toUnsafe(row).copy()))
        }
      }
    }
    heaps.iterator.map { case (key, heap) =>
      key -> heap.dequeueAll.reverse.toSeq // ascending under ord = rank order
    }
  }
}

/** Map-side cut: emits each partition's per-group top-k candidates.
  * No distribution requirement — runs before the exchange. */
case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    order: SortOrder,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(iter =>
      TopKHeap.perGroup(iter, groupExprs, order, k, child.output)
        .flatMap(_._2.iterator.map(_._2)),
      preservesPartitioning = true)

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

/** Reduce side: requires clustering on the group key (Spark inserts the
  * hash exchange), re-runs the bounded heap over the ≤ k·partitions
  * candidates per group, and appends the 1-based rank. */
case class TopKPerGroupFinalExec(
    groupExprs: Seq[Expression],
    order: SortOrder,
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    // empty group = GLOBAL top-k: every candidate must reach one
    // partition for the final merge (AllTuples), else each partition
    // would emit its own "global" top-k
    if (groupExprs.isEmpty)
      org.apache.spark.sql.catalyst.plans.physical.AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(output, output)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      TopKHeap.perGroup(iter, groupExprs, order, k, child.output)
        .flatMap { case (_, rows) =>
          rows.iterator.zipWithIndex.map { case ((_, row), i) =>
            rankRow.update(0, i + 1)
            proj(joined(row, rankRow)).copy()
          }
        }
    }, preservesPartitioning = true)

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

object TopKPerGroup {
  /** DataFrame-API entry: top-k rows per group under `order`, with a
    * 1-based `rn` rank column appended. */
  def apply(df: DataFrame, groupCols: Seq[Column], order: Column,
      descending: Boolean, k: Int): DataFrame = {
    val dir = if (descending)
      org.apache.spark.sql.catalyst.expressions.Descending else Ascending
    val node = TopKPerGroupNode(
      groupCols.map(bridge.expression(df.sparkSession, _)),
      SortOrder(bridge.expression(df.sparkSession, order), dir),
      k,
      df.queryExecution.logical)
    bridge.ofRows(df.sparkSession, node)
  }
}
