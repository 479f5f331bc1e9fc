package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, RowOrdering, SortOrder}
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
/** @param rankAttr when set, the operator also emits the 1-based rank
  *                  within each key (ascending `order`) under this exact
  *                  attribute — lets [[TopKRewriteRule]] replace a
  *                  row_number window while preserving the plan's schema
  *                  and expression ids. */
final case class TopKPerKey(k: Int, keys: Seq[Expression],
                            order: Seq[SortOrder], child: LogicalPlan,
                            rankAttr: Option[Attribute] = None)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

final case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder], child: SparkPlan,
                                rankAttr: Option[Attribute] = None)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  /** Hash-cluster rows by key — Catalyst inserts the exchange. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  /** Keys-only sort within each partition (Catalyst inserts a SortExec):
    * groups then arrive contiguously, so execution holds ONE O(k) heap at
    * a time and emits each group as soon as it ends — memory is O(k)
    * regardless of key cardinality, and any spilling happens in Spark's
    * external (disk-backed) sort, not here. This is the same memory model
    * as Spark's own WindowGroupLimitExec. The operator's win over
    * WindowExec is intact: the sort covers the KEYS only — the order
    * columns are never sorted, the heap keeps that part O(n log k).
    * (The earlier shape — a heap per key in one hash map — held
    * #keys × k rows before emitting anything: an executor OOM on
    * high-cardinality keys, e.g. top-5 neighbors per document.) */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val outTypes = output.map(_.dataType).toArray
    val emitRank = rankAttr.isDefined
    child.execute().mapPartitions ({ iter =>
      val ordering = RowOrdering.create(sortOrder, childOutput)
      val keyProj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(keyExprs, childOutput)
      // Exec output must be UnsafeRow (shuffle serializers and
      // getByteArrayRdd cast unconditionally) — project the rank-extended
      // rows instead of emitting raw JoinedRows.
      lazy val rankProj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(outTypes)
      val in = iter.buffered
      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && in.hasNext) advanceGroup()
          out.hasNext
        }
        override def next(): InternalRow = { hasNext; out.next() }
        /** Consume one contiguous key group into a bounded "worst-first"
          * heap (head = first row to evict, so insert is O(log k)). */
        private def advanceGroup(): Unit = {
          val key = keyProj(in.head).copy()
          val heap = scala.collection.mutable.PriorityQueue
            .empty[InternalRow](ordering.asInstanceOf[Ordering[InternalRow]])
          var same = true
          while (same && in.hasNext) {
            if (keyProj(in.head) == key) {
              val row = in.next()
              if (heap.size < kLocal) heap.enqueue(row.copy())
              else if (ordering.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row.copy())
              }
            } else same = false
          }
          val rows = heap.dequeueAll.reverseIterator // ascending sort order
          out = if (!emitRank) rows
          else rows.zipWithIndex.map { case (row, i) =>
            rankProj(new org.apache.spark.sql.catalyst.expressions.JoinedRow(
              row, InternalRow(i + 1))): InternalRow
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child, rankAttr) =>
      TopKPerKeyExec(k, keys, order, planLater(child), rankAttr) :: Nil
    case _ => Nil
  }
}

/** Optimizer rewrite — the `Rule[LogicalPlan]` rung: a
  * `filter(row_number().over(partitionBy(P).orderBy(O)) <= k)` pattern is
  * THE top-k idiom users actually write; this rule swaps the
  * full-sort WindowExec plan for the bounded-heap operator, emitting the
  * rank under the window expression's original attribute so the rest of
  * the plan (projections, downstream filters on rn) is untouched. */
object TopKRewriteRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window, WindowGroupLimit}

  private def kOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
               parts, order, child, _)) if parts.nonEmpty =>
      kOf(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 =>
          // Spark's InferWindowGroupLimit may already have inserted a
          // group-limit below this Window (it bounds shuffle volume but
          // still sorts); the heap operator subsumes it — unwrap.
          val input = child match {
            case WindowGroupLimit(_, _, _, _, grandchild) => grandchild
            case other => other
          }
          TopKPerKey(k, parts, order, input, Some(alias.toAttribute))
        case _ => f
      }
  }
}

object TopK {
  /** Install strategy + rewrite rule once per session (idempotent). */
  def setup(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        TopKStrategy +: spark.experimental.extraStrategies
  }

  /** Opt-in: also rewrite row_number-filter windows into TopKPerKey. */
  def setupRewrite(spark: SparkSession): Unit = {
    setup(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        TopKRewriteRule +: spark.experimental.extraOptimizations
  }

  /** Remove the rewrite (keeps the strategy for explicit perKey calls). */
  def teardownRewrite(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)

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
