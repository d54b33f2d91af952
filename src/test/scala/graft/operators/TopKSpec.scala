package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK
import graft.Tables

/** TopKPerKey (custom LogicalPlan/Strategy/SparkPlan): must agree row-for-
  * row with the window row_number formulation, and must plan as the
  * bounded-heap operator — no per-partition sort.
  */
class TopKSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("top-3 orders per priority == window row_number filter") {
    val orders = Tables.orders(spark, sfDir)
    val viaTopK = TopK.perKey(orders, 3,
        Seq(col("o_orderpriority")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc))
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    assert(viaTopK.count() === viaWindow.count())
    assert(viaTopK.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaTopK).count() === 0)
  }

  test("plans as TopKPerKeyExec with no per-partition sort") {
    val orders = Tables.orders(spark, sfDir)
    val plan = TopK.perKey(orders, 5, Seq(col("o_orderpriority")),
      Seq(col("o_totalprice").desc)).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom operator missing from plan:\n$plan")
    assert(!plan.contains("Sort "), s"top-k must not sort partitions:\n$plan")
    assert(!plan.contains("Window"), s"top-k must not fall back to a window:\n$plan")
  }

  test("k larger than group size returns whole groups") {
    val orders = Tables.orders(spark, sfDir)
    val n = TopK.perKey(orders, 1000000, Seq(col("o_orderpriority")),
      Seq(col("o_orderkey").asc)).count()
    assert(n === orders.count())
  }

  test("pathological key cardinality spills to external sort, stays exact") {
    import spark.implicits._
    // every row its own key -> heap state would be |partition| rows; a
    // tight buffer cap forces the spill-capable sort path on every task
    val df = (0 until 200000).map(i => (i.toLong % 50000, i.toLong, (i * 31 % 997).toLong))
      .toDF("key", "id", "score")
    val prev = spark.conf.getOption("spark.graft.topk.maxBufferedRows")
    spark.conf.set("spark.graft.topk.maxBufferedRows", "100")
    try {
      val viaTopK = TopK.perKey(df, 2, Seq(col("key")),
        Seq(col("score").desc, col("id").asc))
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
      assert(viaTopK.count() === viaWindow.count())
      assert(viaTopK.exceptAll(viaWindow).count() === 0)
      assert(viaWindow.exceptAll(viaTopK).count() === 0)
      // the fallback actually engaged
      def collectExecs(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[graft.plans.TopKPerKeyExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          collectExecs(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          collectExecs(q.plan)
        case other =>
          (other match {
            case t: graft.plans.TopKPerKeyExec => Seq(t)
            case _ => Seq.empty
          }) ++ other.children.flatMap(collectExecs)
      }
      val q = TopK.perKey(df, 2, Seq(col("key")),
        Seq(col("score").desc, col("id").asc))
      q.collect()
      val execs = collectExecs(q.queryExecution.executedPlan)
      assert(execs.nonEmpty, "TopKPerKeyExec not found in executed plan")
      assert(execs.head.metrics("spillFallbacks").value > 0,
        "expected the external-sort fallback to engage under the tight cap")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxBufferedRows", v)
        case None => spark.conf.unset("spark.graft.topk.maxBufferedRows")
      }
    }
  }

  test("-0.0 and 0.0 double keys form ONE group on heap and spill paths") {
    import spark.implicits._
    // binary forms differ but the values compare equal: a raw UnsafeRow
    // hash key or byte-equality boundary check would split the group and
    // emit up to 2k rows for it
    val df = Seq((0.0d, 1L, 10L), (-0.0d, 2L, 20L), (0.0d, 3L, 30L),
        (-0.0d, 4L, 40L), (1.5d, 5L, 50L))
      .toDF("key", "id", "score")
    def check(): Unit = {
      val top = TopK.perKey(df, 2, Seq(col("key")),
        Seq(col("score").desc, col("id").asc)).collect()
      val zeroGroup = top.filter(_.getDouble(0) == 0.0).map(_.getLong(1)).sorted
      assert(zeroGroup.toSeq === Seq(3L, 4L),
        s"zero-keyed group not deduped: got ids ${zeroGroup.mkString(",")}")
      assert(top.length === 3) // 2 from the zero group + 1 from key=1.5
    }
    check() // heap path
    val prev = spark.conf.getOption("spark.graft.topk.maxBufferedRows")
    spark.conf.set("spark.graft.topk.maxBufferedRows", "1")
    try check() // spill path: cap of 1 forces the external sort
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.topk.maxBufferedRows", v)
      case None => spark.conf.unset("spark.graft.topk.maxBufferedRows")
    }
  }
}
