package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

import scala.collection.mutable

/** Whole-operator extension (the brief's custom-operator ladder rung c):
  * grouped top-k as a first-class plan node.
  *
  * Spark's idiomatic form — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — shuffles EVERY row to its group's partition and
  * fully sorts each partition before the filter throws almost all of it
  * away. At 100 TB that is a full-data exchange + sort for a k·|groups|
  * result. This operator plans the aggregation-style two-phase shape
  * instead: a partial pass keeps a bounded k-row heap per group per input
  * partition (no sort, O(k·groups) memory), the exchange moves only those
  * survivors (≤ k·groups·partitions rows), and a final pass re-heaps per
  * group. The physical pair mirrors partial/final HashAggregate, with
  * `EnsureRequirements` inserting the (tiny) exchange from the final
  * node's required ClusteredDistribution.
  *
  * Requires a total order (unique tie-break) for deterministic results —
  * same contract as rank-based top-k everywhere else in this repo.
  * Rows come out grouped but unranked/unsorted; callers needing ranks
  * window over the k·|groups| survivors, which is negligible.
  *
  * Sizing contract: the heaps are in-memory with NO spill path — a task
  * holds k rows per group it sees, so the operator targets workloads
  * where k·|groups| fits an executor (top-k per query/doc/source/day:
  * millions of groups at small k). For group cardinalities approaching
  * row count, the window form's sort-and-spill machinery is the right
  * tool and this operator is the wrong one — by construction, not by
  * accident.
  */
case class GroupedTopK(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK = copy(child = c)
}

object GroupedTopK {
  /** DataFrame-level entry: resolve names against the child's analyzed
    * output and wrap it in the logical node. `orderSpec` is
    * (columnName, ascending) — the op requires the spec to be a total
    * order over each group for deterministic output. */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      lp.output.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(s"cannot resolve $name"))
    val g = groupCols.map(attr)
    val o = orderSpec.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    org.apache.spark.sql.GraftSqlBridge.ofRows(df.sparkSession, GroupedTopK(g, o, k, lp))
  }
}

/** Physical grouped top-k: bounded per-group heaps in one pass.
  * `partial = true` runs pre-shuffle on arbitrary partitions; the final
  * node demands clustering on the group keys, so the exchange between
  * the pair carries only partial survivors. */
case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))
  override def nodeName: String =
    if (partial) "GroupedTopKPartial" else "GroupedTopKFinal"

  /** Observable like HashAggregate: output rows plus the per-task heap
    * group count (summed over tasks — for the partial node that is
    * groups×partitions, the exchange volume / k; for the final node the
    * true group cardinality). Peak memory is bounded by
    * numGroups × k × rowSize per task by construction.
    *
    * Like HashAggregate's metrics, both counters increment per task
    * ATTEMPT — speculative execution or task retries inflate them, so
    * they are throughput indicators, not exact-once counts (exact
    * equality only holds on retry-free runs, e.g. local tests). */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of heap groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val gExprs = groupExprs
    val sOrder = order
    val kk = k
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, schema)
      val toUnsafe = UnsafeProjection.create(schema.map(_.asInstanceOf[Expression]), schema)
      // compare(a,b) < 0 ⟺ a ranks before b; PQ head = worst row kept
      val ordering = GenerateOrdering.generate(sOrder, schema)
      val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        var heap = heaps.get(keyProj(row))
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[InternalRow](ordering)
          heaps.put(keyProj(row).copy(), heap)
        }
        if (heap.size < kk) heap += toUnsafe(row).copy()
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += toUnsafe(row).copy()
        }
      }
      numGroups += heaps.size()
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
        .map { r => numOutputRows += 1; r }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): GroupedTopKExec = copy(child = c)
}

/** Plans the logical node as the partial/final physical pair. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child) =>
      val partial = GroupedTopKExec(g, o, k, partial = true, planLater(child))
      GroupedTopKExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}
