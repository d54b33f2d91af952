package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins (SPJ): the COLE scan reports
  * KeyGroupedPartitioning over its hive partition keys, so two tables
  * partitioned on the same key join with ZERO shuffle on either side, and
  * a groupBy(partition key) aggregates without an exchange — at 100 TB
  * that deletes the dominant cost of a co-partitioned fact-fact join.
  */
class ColeSpjSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // the two Engine.scala SPJ levers under test
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    .getOrCreate()

  private def countShuffles(df: DataFrame): Int = {
    df.collect() // materialize so AQE settles on the final plan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0) +
        p.children.map(walk).sum +
        p.subqueries.map(walk).sum +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ => 0
        })
    walk(df.queryExecution.executedPlan)
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private lazy val dirs: (String, String) = {
    val s = spark
    import s.implicits._
    val left = Files.createTempDirectory("cole_spj_left").toString
    val right = Files.createTempDirectory("cole_spj_right").toString
    (0 until 20000).map(i => (i.toLong, i % 16, s"L$i"))
      .toDF("l_id", "k", "l_tag")
      .write.format("cole").mode("overwrite").partitionBy("k").save(left)
    (0 until 4000).map(i => (i.toLong, i % 16, (i % 7).toLong))
      .toDF("r_id", "k", "r_w")
      .write.format("cole").mode("overwrite").partitionBy("k").save(right)
    (left, right)
  }

  test("co-partitioned equality join runs with zero shuffle") {
    val (left, right) = dirs
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val l = spark.read.format("cole").load(left)
      val r = spark.read.format("cole").load(right)
      val joined = l.join(r, "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("r_w").as("w"))
      assert(countShuffles(joined) === 0,
        s"SPJ must leave no exchange:\n${joined.queryExecution.executedPlan}")
      val got = joined.collect().map(r0 => r0.getInt(0) -> ((r0.getLong(1), r0.getLong(2)))).toMap
      val expect = (0 until 16).map { k =>
        val ln = (0 until 20000).count(_ % 16 == k).toLong
        val rs = (0 until 4000).filter(_ % 16 == k)
        k -> ((ln * rs.size, ln * rs.map(i => (i % 7).toLong).sum))
      }.toMap
      assert(got === expect)
    }
  }

  test("join result matches the shuffled plan exactly") {
    val (left, right) = dirs
    val l = spark.read.format("cole").load(left)
    val r = spark.read.format("cole").load(right)
    val spj = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      l.join(r, "k").select("l_id", "r_id", "l_tag", "r_w").collect().toSet
    }
    val shuffled = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "false") {
      l.join(r, "k").select("l_id", "r_id", "l_tag", "r_w").collect().toSet
    }
    assert(spj === shuffled)
    assert(spj.nonEmpty)
  }

  test("groupBy(partition key) keeps aggregate pushdown (partial rows shuffle, not data)") {
    // The pushdown rewrite's `Project [k AS group_col_0]` hides the scan's
    // key-grouped clustering from the final aggregate (alias-aware
    // propagation only rewrites hash/range partitionings), so ONE exchange
    // remains — but it carries only the pushed partial rows (≤ one per
    // group per file), not table data. Pushdown + tiny shuffle beats
    // no-pushdown + no shuffle: the chunk sweeps are what cost at 100 TB.
    val (left, _) = dirs
    val df = spark.read.format("cole").load(left)
      .groupBy("k").agg(count(lit(1)).as("n"), min("l_id").as("mn"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "grouped agg on the partition key should still push into the source")
    assert(countShuffles(df) <= 1)
    val got = df.collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = (0 until 16).map { k =>
      k -> (((20000 / 16).toLong, k.toLong))
    }.toMap
    assert(got === expect)
  }

  test("row-scan groupBy(partition key) also avoids the exchange") {
    val (left, _) = dirs
    // collect_list is not pushable — the aggregate runs above a plain row
    // scan, which still reports its key-grouped clustering
    val df = spark.read.format("cole").load(left)
      .groupBy("k").agg(sort_array(collect_list("l_tag")).as("tags"))
    assert(!df.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(countShuffles(df) === 0,
      s"row-scan partition-key groupBy needs no exchange:\n${df.queryExecution.executedPlan}")
    assert(df.count() === 16)
  }

  test("partition-value mismatch still joins shuffle-free via pushed values") {
    val s = spark
    import s.implicits._
    val narrow = Files.createTempDirectory("cole_spj_narrow").toString
    // only 5 of the left table's 16 partition values exist here
    (0 until 500).map(i => (i.toLong, i % 5, i.toLong * 2))
      .toDF("n_id", "k", "n_w")
      .write.format("cole").mode("overwrite").partitionBy("k").save(narrow)
    val (left, _) = dirs
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val l = spark.read.format("cole").load(left)
      val n = spark.read.format("cole").load(narrow)
      val joined = l.join(n, "k")
      assert(countShuffles(joined) === 0,
        s"mismatched partition-value sets must not reintroduce a shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() ===
        (0 until 20000).map(i => (0 until 500).count(_ % 5 == i % 16)).sum.toLong)
    }
  }
}
