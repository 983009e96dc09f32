package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (SURVEY.md §2b preference order (c)): a
  * custom logical node + planner strategy + physical operator pair for
  * per-group top-k.
  *
  * Why not a window: `row_number().over(partitionBy(g).orderBy(o)) <= k`
  * fully sorts every group after the shuffle — O(n log n) per group and
  * the whole group materialized in the sorter. This operator instead:
  *
  *  - '''Map side''' ([[TopKPerGroupPartialExec]]): a bounded k-heap per
  *    group cuts each map partition to ≤ k candidate rows per group
  *    before the exchange. The heap map is memory-bounded: past
  *    `graft.topk.partialMaxGroups` distinct groups (default 65536) it
  *    flushes its candidates downstream and starts a fresh map — the
  *    same degrade-to-partial-results shape HashAggregate uses when its
  *    hash map cannot grow. A flushed partition may emit more than k
  *    rows per group (k per flush window); the final pass re-cuts, so
  *    the bound only loosens the cut, never correctness.
  *  - '''Reduce side''' ([[TopKPerGroupFinalExec]]): declares a required
  *    child ordering on (group, order), so Spark plans its own
  *    spill-capable SortExec under the exchange output, and the final
  *    pass is a pure streaming scan — emit the first k rows of each
  *    group with their 1-based rank, O(1) operator memory at any group
  *    cardinality. Memory safety at scale is inherited from SortExec's
  *    external sorter rather than an unbounded hash map.
  *
  * Registered via `GraftExtensions`/`injectPlannerStrategy`; built from
  * the DataFrame API with [[TopKPerGroup.apply]] (which requires
  * k ≥ 1).
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

  require(k >= 1, s"TopKPerGroup requires k >= 1, got $k")

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

/** Map-side cut: emits each partition's per-group top-k candidates from
  * a bounded heap map. No distribution requirement — runs before the
  * exchange. When the map reaches `maxGroups` distinct groups it
  * flushes and restarts, so task memory is bounded by maxGroups·k rows
  * regardless of group cardinality. */
case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    order: SortOrder,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val maxGroups =
      conf.getConfString("graft.topk.partialMaxGroups", "65536").toInt
    val childOutput = child.output
    val g = groupExprs
    val o = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(g, childOutput)
      // child rows are InternalRow but not necessarily Unsafe (e.g. a
      // columnar scan boundary) — normalize before copying into the heap
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val orderExpr = BindReferences.bindReference(o.child, childOutput)
      val base = PhysicalDataType.ordering(o.child.dataType)
        .asInstanceOf[Ordering[Any]]
      val ord: Ordering[Any] =
        if (o.direction == Ascending) base else base.reverse
      val heapOrd: Ordering[(Any, UnsafeRow)] =
        Ordering.by[(Any, UnsafeRow), Any](_._1)(ord)

      // chunked scan: fill a heap map until the input ends or the map
      // holds maxGroups groups, emit everything kept, repeat
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && iter.hasNext) fill()
          out.hasNext
        }
        override def next(): InternalRow = { hasNext; out.next() }
        private def fill(): Unit = {
          // heap keeps the currently-kept rows with the WORST at the head
          val heaps = new scala.collection.mutable.HashMap[
            UnsafeRow, scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]]
          while (iter.hasNext && heaps.size < maxGroups) {
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
              if (heap.size < kk) {
                heap.enqueue((v, toUnsafe(row).copy()))
              } else if (ord.lt(v, heap.head._1)) {
                heap.dequeue()
                heap.enqueue((v, toUnsafe(row).copy()))
              }
            }
          }
          out = heaps.iterator.flatMap(_._2.iterator.map(_._2))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

/** Reduce side: requires clustering on the group key (Spark inserts the
  * hash exchange) AND ordering on (group, order) (Spark inserts a
  * spill-capable SortExec), then streams the sorted candidates emitting
  * the first k rows per group with a 1-based rank — O(1) memory. */
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

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupExprs.map(SortOrder(_, Ascending)) :+ order)

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val g = groupExprs
    val o = order
    val kk = k
    val out = output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(g, childOutput)
      val orderExpr = BindReferences.bindReference(o.child, childOutput)
      val proj = UnsafeProjection.create(out, out)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      var prevKey: UnsafeRow = null
      var emitted = 0
      iter.flatMap { row =>
        // partial already dropped null ordering values; keep the guard
        // so final-only plans (or future strategies) share the contract
        if (orderExpr.eval(row) == null) Iterator.empty
        else {
          val key = groupProj(row)
          if (prevKey == null || key != prevKey) {
            prevKey = key.copy()
            emitted = 0
          }
          if (emitted < kk) {
            emitted += 1
            rankRow.update(0, emitted)
            Iterator.single(proj(joined(row, rankRow)).copy())
          } else Iterator.empty
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}

object TopKPerGroup {
  /** DataFrame-API entry: top-k rows per group under `order`, with a
    * 1-based `rn` rank column appended. Requires k ≥ 1. */
  def apply(df: DataFrame, groupCols: Seq[Column], order: Column,
      descending: Boolean, k: Int): DataFrame = {
    require(k >= 1, s"TopKPerGroup requires k >= 1, got $k")
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
