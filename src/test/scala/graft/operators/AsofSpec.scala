package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the as-of join: inclusive ties, no-match nulls,
  * per-key isolation, and multi-column carry.
  */
class AsofSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: inclusive at equal ts, null when nothing precedes, key-isolated") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")), // exact-tie with right row
      (2L, 10L, ts("2026-01-01 09:00:00")), // before any right row -> null
      (3L, 20L, ts("2026-01-01 12:00:00")), // other key: sees only key-20 rows
      (4L, 10L, ts("2026-01-01 11:30:00"))  // latest-of-several wins
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 10:00:00"), 100.0),
      (10L, ts("2026-01-01 11:00:00"), 200.0),
      (20L, ts("2026-01-01 11:59:00"), 300.0),
      (20L, ts("2026-01-01 12:30:00"), 400.0)  // after left ts: never matches
    ).toDF("user_id", "ts", "price")

    val out = Asof.joinAsof(left, right, "user_id", "ts", Seq("price", "ts"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Timestamp]))).toMap

    assert(out(1L) == (Some(100.0), Some(ts("2026-01-01 10:00:00"))), "tie must match inclusively")
    assert(out(2L) == (None, None), "nothing precedes -> nulls")
    assert(out(3L) == (Some(300.0), Some(ts("2026-01-01 11:59:00"))), "key isolation + latest")
    assert(out(4L) == (Some(200.0), Some(ts("2026-01-01 11:00:00"))), "latest of several")
  }

  test("asof join: latest right ROW wins even when its carried value is NULL") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 12:00:00"))
    ).toDF("event_id", "user_id", "ts")
    // The most recent preceding right row carries a NULL price: DuckDB ASOF
    // semantics attach THAT row's NULL, not the older 100.0.
    val right = Seq(
      (10L, ts("2026-01-01 10:00:00"), Some(100.0)),
      (10L, ts("2026-01-01 11:00:00"), Option.empty[Double])
    ).toDF("user_id", "ts", "price")

    val rows = Asof.joinAsof(left, right, "user_id", "ts", Seq("price", "ts"))
      .collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(3), "latest right row's NULL must win, not an older value")
    assert(rows(0).getTimestamp(4) == ts("2026-01-01 11:00:00"),
      "the asof_ts must still come from the latest right row")
  }

  test("asof join plan: single shuffle on the key, no range join explosion") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, ts("2026-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2026-01-01 09:00:00"), 1.0)).toDF("user_id", "ts", "price")
    val plan = Asof.joinAsof(left, right, "user_id", "ts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("SortMergeJoin"),
      s"asof should be union+window, not a join:\n$plan")
    assert(plan.contains("Window"), "asof fill must be a window, got:\n" + plan)
  }
}
