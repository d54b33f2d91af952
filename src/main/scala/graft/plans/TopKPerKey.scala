package graft.plans

import scala.collection.mutable

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * Memory safety: per-partition heap state is (keys in partition) × k
  * rows. When that exceeds `spark.graft.topk.maxBufferedRows` (default
  * 4M) the partition falls back to a spill-capable external sort on
  * (key, order) — Spark's own UnsafeExternalRowSorter, the same machinery
  * SortExec uses — followed by a streaming first-k-per-group pass. So
  * pathological key cardinality degrades to the window spelling's cost
  * instead of OOMing. Rows already evicted by the heaps were provably
  * outside their key's top-k, so handing the surviving heap rows plus the
  * unread remainder to the sorter preserves exactness.
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
      val maxBuffered = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.maxBufferedRows", (4 << 20).toString).toLong
      TopKPerKeyExec(k, part, order, maxBuffered, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    maxBufferedRows: Long,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "spillFallbacks" -> SQLMetrics.createMetric(sparkContext,
      "partitions that fell back to external sort"))

  /** Rows sharing a key must meet in one partition — the planner inserts
    * the (single) shuffle; no sort is requested.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  /** Group keys normalized for floating-point equality: -0.0 and 0.0 (and
    * differing NaN bit patterns) compare equal but have distinct binary
    * forms, so an UnsafeRow-keyed hash or a byte-equality group-boundary
    * check would split one logical group. Same normalization Catalyst
    * applies to group/join keys, local to this operator.
    */
  private def normalizeKey(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{If, IsNaN, Literal}
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    e.dataType match {
      case DoubleType =>
        If(IsNaN(e), Literal(Double.NaN),
          org.apache.spark.sql.catalyst.expressions.Add(e, Literal(0.0d)))
      case FloatType =>
        If(IsNaN(e), Literal(Float.NaN),
          org.apache.spark.sql.catalyst.expressions.Add(e, Literal(0.0f)))
      case _ => e
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val maxBuffered = maxBufferedRows
    val partExprs = partitionExprs.map(normalizeKey)
    val sortOrder = order
    val spillMetric = longMetric("spillFallbacks")
    // the sort fallback orders by (key, order); only possible when the key
    // types are orderable (they are for any groupable key in practice)
    val keyOrderable = partExprs.forall(e => RowOrdering.isOrderable(e.dataType))
    val rowSchema = StructType(childOutput.map(a =>
      StructField(a.name, a.dataType, a.nullable)))

    val perPartition = (rows: Iterator[InternalRow]) => {
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap on the sort order: the head is the WORST of the current
      // top-k, evicted when a better row arrives.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      var buffered = 0L
      var overflow = false
      while (rows.hasNext && !overflow) {
        val row = rows.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(pq) =>
            if (pq.size < kLocal) { pq.enqueue(row.copy()); buffered += 1 }
            else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
          case None =>
            val pq = mutable.PriorityQueue.empty[UnsafeRow](ord.asInstanceOf[Ordering[UnsafeRow]])
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
            buffered += 1
        }
        if (buffered > maxBuffered && keyOrderable) overflow = true
      }
      if (!overflow) heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
      else {
        spillMetric += 1
        val fullOrder = partExprs.map(e => SortOrder(e, Ascending)) ++ sortOrder
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.value = 0L; p.isNull = false; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          rowSchema, new LazilyGeneratedOrdering(fullOrder, childOutput),
          PrefixComparators.LONG, prefixComputer,
          SparkEnv.get.memoryManager.pageSizeBytes, false)
        heaps.valuesIterator.foreach(_.foreach(sorter.insertRow))
        heaps.clear()
        while (rows.hasNext) sorter.insertRow(rows.next().asInstanceOf[UnsafeRow])
        var curKey: UnsafeRow = null
        var emitted = 0
        sorter.sort().filter { r =>
          val key = keyProj(r.asInstanceOf[UnsafeRow])
          if (curKey == null || key != curKey) { curKey = key.copy(); emitted = 0 }
          emitted += 1
          emitted <= kLocal
        }
      }
    }: Iterator[InternalRow]
    child.execute().mapPartitions(perPartition, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
