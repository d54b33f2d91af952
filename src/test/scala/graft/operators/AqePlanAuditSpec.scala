package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** AQE-final-plan audits at sf0.1: [[PlanAuditSpec]] pins the STATIC plans
  * (AQE off, tiny SF); this suite executes the headline joins with AQE ON
  * at the driver's bench SF and asserts the invariants survive runtime
  * re-planning — broadcast thresholds re-evaluated on real sizes must not
  * flip an equality join into a BroadcastNestedLoopJoin, and the skew-join
  * machinery must be armed for the shuffled joins.
  */
class AqePlanAuditSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.1"

  /** Execute to completion (rows stay distributed — no driver collect),
    * then render the ADAPTIVE final plan.
    */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("skew-join support is armed in this session") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
  }

  test("join_shuffle final plan: shuffled equality join, skew-handling eligible") {
    val p = finalPlan("join_shuffle")
    assert(p.contains("isFinalPlan=true"), s"AQE never finalized:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), // AQE may legally broadcast at this SF
      s"join_shuffle lost its hash-equality join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"join_shuffle degenerated under AQE:\n$p")
  }

  test("TPC-H joins keep equality strategies under AQE re-planning") {
    // q2 (double agg + min-cost rejoin) and q21 (per-order distinct
    // aggregate rejoined to the late rows) are the heaviest of the
    // adapted additions — exactly where a runtime re-plan could slip in
    // a nested-loop join.
    for (q <- Seq("tpch_q3", "tpch_q5", "tpch_q10", "tpch_q2", "tpch_q21")) {
      val p = finalPlan(q)
      assert(p.contains("isFinalPlan=true"), s"$q: AQE never finalized")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degenerated to a product join under AQE:\n$p")
    }
  }

  test("LSH dedup and ANN stay equality-join-bounded under AQE") {
    for (q <- Seq("dedup_minhash_lsh", "ann_lsh", "ann_pq", "ann_ivfpq")) {
      val p = finalPlan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degenerated under AQE:\n$p")
    }
  }

  test("bloom decontamination and paragraph dedup survive AQE at sf0.1") {
    for (q <- Seq("corpus_bloom_decontaminate", "dedup_paragraph")) {
      val p = finalPlan(q)
      assert(p.contains("isFinalPlan=true"), s"$q: AQE never finalized")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q degenerated under AQE:\n$p")
    }
  }

  test("subquery_in stays a semi join under AQE") {
    val p = finalPlan("subquery_in")
    assert(p.contains("SemiJoin") || p.contains("LeftSemi"),
      s"IN-subquery lost its semi join under AQE:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("AQE actually re-plans: coalesced shuffle reads appear") {
    // at 32 static shuffle partitions over sf0.1, partition coalescing
    // should engage on at least one headline aggregation
    val p = finalPlan("groupby_agg")
    assert(p.contains("AQEShuffleRead") || p.contains("CoalescedShuffleRead"),
      s"AQE made no runtime adjustment where one was expected:\n$p")
  }
}
