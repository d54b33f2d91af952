package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{RepartitionByExpression, Sort}
import org.apache.spark.sql.GraftBridge

/** User-facing entry for the [[TopKPerKey]] operator. */
object TopK {

  /** Top-k rows per key, ordered by `orderBy` (use `.desc`/`.asc` Columns;
    * ties should be broken by a unique column for determinism).
    *
    * Ensures the planner strategy is installed on the DataFrame's session,
    * so the operator works with or without [[graft.GraftExtensions]].
    */
  def perKey(df: DataFrame, k: Int, partitionBy: Seq[Column],
      orderBy: Seq[Column]): DataFrame = {
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.exists(_.isInstanceOf[TopKPerKeyStrategy]))
      exp.extraStrategies = exp.extraStrategies :+ new TopKPerKeyStrategy
    // Resolve the key/order expressions by routing them through standard
    // repartition+sort nodes — the analyzer binds them to df's output —
    // then lift the RESOLVED expressions into the custom node. (Column →
    // Expression conversion alone leaves lazy unresolved wrappers the
    // analyzer won't touch inside a node it doesn't know.)
    val probe = df.repartition(partitionBy: _*).sortWithinPartitions(orderBy: _*)
      .queryExecution.analyzed
    val sort = probe.asInstanceOf[Sort]
    val rep = sort.child.asInstanceOf[RepartitionByExpression]
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKey(k, rep.partitionExpressions, sort.order, rep.child))
  }
}
