package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.shim

/** Whole-operator custom plan: top-k rows per key WITHOUT a per-partition
  * full sort.
  *
  * The built-in way to say "top k per key" is
  * `row_number().over(Window.partitionBy(key).orderBy(ord)) <= k`, and
  * WindowExec must SORT every partition completely — O(n log n) per
  * partition and the whole partition buffered — to number rows it then
  * throws away. For k << group size (the corpus case: top-5 neighbors among
  * millions of candidates) a bounded heap per key is O(n log k) with O(k)
  * state per key, and it streams.
  *
  * This is the (c) rung of the custom-operator ladder (SURVEY.md §2.9):
  * a `LogicalPlan` node + `Strategy` + `SparkPlan`, registered via
  * `spark.experimental.extraStrategies` (or SparkSessionExtensions).
  * Catalyst still owns distribution: the exec node declares
  * `ClusteredDistribution(keys)`, so the planner inserts the hash shuffle —
  * we never hand-schedule.
  *
  * Result parity: identical row set to the window row_number form for
  * strict total orderings (callers include a tie-break column, same as
  * they must for a deterministic window) — q35 hash-matches the DuckDB
  * window-SQL oracle.
  */
final case class TopKPerKey(k: Int, keys: Seq[Expression],
                            order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

final case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder], child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  /** Hash-cluster rows by key — Catalyst inserts the exchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions ({ iter =>
      val ordering = RowOrdering.create(sortOrder, childOutput)
      val keyProj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(keyExprs, childOutput)
      // key -> bounded "worst-first" heap: the head is the row that leaves
      // first, so insert is O(log k) and state is O(k) per key
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[InternalRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row).copy()
        val heap = heaps.getOrElseUpdate(key,
          // PriorityQueue dequeues its LARGEST element; with the sort
          // ordering directly, "largest" = last in sort order = the row to
          // evict — exactly what a bounded top-k wants.
          scala.collection.mutable.PriorityQueue.empty[InternalRow](
            ordering.asInstanceOf[Ordering[InternalRow]]))
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) => heap.dequeueAll.reverseIterator }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Install the strategy once per session (idempotent). */
  def setup(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        TopKStrategy +: spark.experimental.extraStrategies
  }

  /** Top-k rows per key, smallest-first under `order` (pass `.desc`
    * columns for top-by-largest; include a tie-break for determinism). */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
             k: Int): DataFrame = {
    val spark = df.sparkSession
    setup(spark)
    val orderExprs = order.map(c => shim.expressionEager(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    shim.ofRows(spark,
      TopKPerKey(k, keys.map(shim.expressionEager), orderExprs, shim.analyzed(df)))
  }
}
