package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key as a first-class operator (SURVEY §5: the custom
  * LogicalPlan → Strategy → SparkPlan extension path).
  *
  * The standard spelling — `row_number() OVER (PARTITION BY k ORDER BY s)`
  * then `WHERE rn <= k` — SORTS every partition fully: O(n log n) per key
  * and a full sort buffer, just to discard everything past rank k. This
  * operator keeps a bounded heap per key instead: O(n log k) time, O(keys
  * × k) memory, one shuffle (the same clustering a window needs). At
  * 100 TB, "top 5 per user" over billions of rows never materializes a
  * sort of each user's history.
  *
  * Memory note: per-partition state is (keys in partition) × k rows and
  * does not spill; that is the same ORDER as the operator's output (the
  * window formulation's sort buffer is the full input instead). For
  * extreme key cardinality per partition, raise shuffle partitions or
  * fall back to the window spelling, which spills.
  */
final case class TopKPerKey(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {

  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, part, order, child) =>
      TopKPerKeyExec(k, part, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Rows sharing a key must meet in one partition — the planner inserts
    * the (single) shuffle; no sort is requested.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val perPartition = (rows: Iterator[InternalRow]) => {
      val keyProj = UnsafeProjection.create(partitionExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(order, childOutput)
      // max-heap on the sort order: the head is the WORST of the current
      // top-k, evicted when a better row arrives.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      rows.foreach { r =>
        val row = r.asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(pq) =>
            if (pq.size < k) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
          case None =>
            val pq = mutable.PriorityQueue.empty[UnsafeRow](ord.asInstanceOf[Ordering[UnsafeRow]])
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }: Iterator[InternalRow]
    child.execute().mapPartitions(perPartition, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
