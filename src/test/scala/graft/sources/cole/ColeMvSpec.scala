package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized views (r14). Pinned here:
  *   - create materializes the full aggregate; refresh after
  *     insert-only DML is PURELY differential (0 keys re-aggregated)
  *     and lands value-identical to a full recompute;
  *   - deletes/updates under min/max re-aggregate ONLY the keys that
  *     saw a delete; keys whose live count reaches zero leave the MV;
  *   - a replayed range is a no-op (watermark) and a refresh with
  *     nothing new touches nothing;
  *   - a crashed refresh (in-flight intent, before OR after its merge
  *     landed) is recovered absolutely on the next refresh — no
  *     double-apply, final state = full recompute either way;
  *   - a source rollback inside the unapplied range is loud and
  *     full => true resynchronizes.
  */
class ColeMvSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_mv_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.mvw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.mvw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private val aggs = ColeMv.parseAggs(
    "count:*:n, sum:v:sum_v, avg:v:avg_v, min:p:min_p, max:p:max_p")

  /** id, k (group key), v (summed), p (min/max'd). */
  private def rows(ids: Range): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i.toLong, s"k${i % 5}", (i % 97).toLong, (i % 13) * 1.5))
      .toDF("id", "k", "v", "p")
  }

  private def mkSource(name: String, ids: Range): String = {
    val t = s"$warehouse/db/$name"
    rows(ids).coalesce(2).write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf)
    t
  }

  /** Ground truth: the full aggregate over the source's LIVE rows,
    * computed by the same algebra create uses.
    */
  private def expected(src: String): Array[String] =
    ColeMv.fullAggregate(spark.read.format("cole").load(src),
      Seq("k"), aggs)
      .collect().map(_.toString).sorted

  private def actual(mv: String): Array[String] =
    spark.read.format("cole").load(mv).collect().map(_.toString).sorted

  test("create materializes the full aggregate; empty refresh is a no-op") {
    val src = mkSource("mv_base", 0 until 200)
    val mv = s"$warehouse/db/mv_base_agg"
    spark.sql("CALL mvw.system.create_mv('db.mv_base', 'db.mv_base_agg', " +
      "'k', 'count:*:n, sum:v:sum_v, avg:v:avg_v, min:p:min_p, max:p:max_p')")
    assert(actual(mv) === expected(src))
    val st = spark.sql("CALL mvw.system.refresh_mv('db.mv_base_agg')").head()
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) === (1L, 1L, 0L))
  }

  test("insert-only refresh is purely differential and value-identical") {
    val src = mkSource("mv_ins", 0 until 150)
    val mv = s"$warehouse/db/mv_ins_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs)
    rows(150 until 400).coalesce(2).write.format("cole").mode("append")
      .save(src)
    rows(400 until 500).coalesce(1).write.format("cole").mode("append")
      .save(src)
    val st = ColeMv.refresh(spark, mv, "mvw.db.mv_ins_agg")
    assert(st.fromVersion === 1L && st.toVersion === 3L)
    // no deletes anywhere: min/max fold differentially, nothing rescans
    assert(st.keysRecomputed === 0L && st.rowsReaggregated === 0L)
    assert(st.keysTouched === 5L)
    assert(actual(mv) === expected(src))
  }

  test("deletes re-aggregate only the touched keys; dead keys leave the MV") {
    val src = mkSource("mv_del", 0 until 200)
    val mv = s"$warehouse/db/mv_del_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs)
    // k0 dies entirely (ids ≡ 0 mod 5); k1 loses SOME rows (its max-p
    // rows among them — delta math alone could never shrink max_p)
    spark.sql(s"DELETE FROM mvw.db.mv_del WHERE k = 'k0'")
    spark.sql(s"DELETE FROM mvw.db.mv_del WHERE k = 'k1' AND p > 10")
    val st = ColeMv.refresh(spark, mv, "mvw.db.mv_del_agg")
    assert(st.keysRecomputed === 2L) // exactly k0 and k1
    assert(st.rowsReaggregated > 0L) // k1's survivors re-aggregated
    assert(actual(mv) === expected(src))
    assert(!spark.read.format("cole").load(mv).select("k").collect()
      .map(_.getString(0)).contains("k0"))
  }

  test("updates (MERGE on the source) fold correctly; replay is a no-op") {
    val src = mkSource("mv_upd", 0 until 100)
    val mv = s"$warehouse/db/mv_upd_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs)
    val s = spark
    import s.implicits._
    Seq((3L, 1000L), (8L, 2000L)).toDF("uid", "uv")
      .createOrReplaceTempView("mv_upd_src")
    spark.sql(
      """MERGE INTO mvw.db.mv_upd t USING mv_upd_src u ON t.id = u.uid
        |WHEN MATCHED THEN UPDATE SET v = u.uv""".stripMargin)
    val st = ColeMv.refresh(spark, mv, "mvw.db.mv_upd_agg")
    assert(st.toVersion === 2L)
    assert(actual(mv) === expected(src))
    // nothing new: the second refresh touches nothing
    val st2 = ColeMv.refresh(spark, mv, "mvw.db.mv_upd_agg")
    assert(st2.keysTouched === 0L && st2.fromVersion === st2.toVersion)
    assert(actual(mv) === expected(src))
  }

  test("a crashed refresh recovers absolutely — no double-apply") {
    val src = mkSource("mv_crash", 0 until 100)
    val mv = s"$warehouse/db/mv_crash_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs)
    rows(100 until 160).coalesce(1).write.format("cole").mode("append")
      .save(src) // v2

    // crash BEFORE the merge landed: intent written, MV untouched
    val d0 = ColeMv.readDefinition(mv, conf)
    ColeMv.writeDefinition(mv, conf, d0.copy(inflight = Some(2L)))
    val st = ColeMv.refresh(spark, mv, "mvw.db.mv_crash_agg")
    assert(actual(mv) === expected(src))
    assert(ColeMv.readDefinition(mv, conf).appliedVersion === 2L)
    assert(st.toVersion === 2L && st.keysTouched === 0L) // recovery did it

    // crash AFTER the merge landed but before the watermark advanced:
    // rewind the sidecar to (appliedv=2, inflight=3) post-refresh — a
    // differential replay would double-count, the recovery must not
    rows(160 until 220).coalesce(1).write.format("cole").mode("append")
      .save(src) // v3
    ColeMv.refresh(spark, mv, "mvw.db.mv_crash_agg") // merge landed, wm=3
    val d1 = ColeMv.readDefinition(mv, conf)
    ColeMv.writeDefinition(mv, conf,
      d1.copy(appliedVersion = 2L, inflight = Some(3L)))
    ColeMv.refresh(spark, mv, "mvw.db.mv_crash_agg")
    assert(actual(mv) === expected(src))
    assert(ColeMv.readDefinition(mv, conf).appliedVersion === 3L)
  }

  test("source rollback is loud; full => true resynchronizes") {
    val src = mkSource("mv_rb", 0 until 80)
    val mv = s"$warehouse/db/mv_rb_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs)
    rows(80 until 120).coalesce(1).write.format("cole").mode("append")
      .save(src) // v2
    ColeMv.refresh(spark, mv, "mvw.db.mv_rb_agg") // wm = 2
    spark.sql("CALL mvw.system.rollback('db.mv_rb', 1)") // v3 = rollback
    val loud = intercept[Exception] {
      ColeMv.refresh(spark, mv, "mvw.db.mv_rb_agg")
    }
    assert(loud.getMessage.contains("rollback"))
    val st = spark.sql(
      "CALL mvw.system.refresh_mv('db.mv_rb_agg', true)").head()
    assert(st.getLong(2) === -1L) // full recompute marker
    assert(actual(mv) === expected(src))
    // and the watermark moved: the next refresh is a clean no-op
    val st2 = ColeMv.refresh(spark, mv, "mvw.db.mv_rb_agg")
    assert(st2.keysTouched === 0L)
  }

  test("full refresh escapes a leftover inflight whose recovery can't run") {
    val src = mkSource("mv_esc", 0 until 60)
    val mv = s"$warehouse/db/mv_esc_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs) // wm = 1
    rows(60 until 90).coalesce(1).write.format("cole").mode("append")
      .save(src) // v2
    spark.sql("CALL mvw.system.rollback('db.mv_esc', 1)") // v3 = rollback
    // a crashed refresh's intent spanning the rollback: its recovery
    // feed read (1, 3] refuses — the FULL escape hatch must still work
    val d = ColeMv.readDefinition(mv, conf)
    ColeMv.writeDefinition(mv, conf, d.copy(inflight = Some(3L)))
    val loud = intercept[Exception] {
      ColeMv.refresh(spark, mv, "mvw.db.mv_esc_agg")
    }
    assert(loud.getMessage.contains("rollback"))
    ColeMv.refresh(spark, mv, "mvw.db.mv_esc_agg", full = true)
    assert(actual(mv) === expected(src))
    val after = ColeMv.readDefinition(mv, conf)
    assert(after.appliedVersion === 3L && after.inflight.isEmpty)
  }

  test("an MV stays fresh under a CDF-driven stream (continuous maintenance)") {
    val src = mkSource("mv_stream", 0 until 100)
    val mv = s"$warehouse/db/mv_stream_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs)
    // the change-feed stream is the TRIGGER; each micro-batch advances
    // the MV from its own watermark (batch replays are harmless — the
    // watermark makes them no-ops), so the MV tracks the source with
    // O(delta) work per trigger and exactly-once state
    val cp = Files.createTempDirectory("mv_stream_cp").toString
    // a STREAMED feed needs DML commits to write change files (the batch
    // feed the refresh itself uses runs the diff join instead)
    spark.conf.set("graft.cole.cdf.materialize", "true")
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .load(src)
      .writeStream.foreachBatch {
        (_: org.apache.spark.sql.DataFrame, _: Long) =>
          ColeMv.refresh(spark, mv, "mvw.db.mv_stream_agg"); ()
      }.option("checkpointLocation", cp).start()
    try {
      rows(100 until 200).coalesce(1).write.format("cole").mode("append")
        .save(src)
      q.processAllAvailable()
      assert(actual(mv) === expected(src))
      spark.sql("DELETE FROM mvw.db.mv_stream WHERE k = 'k2' AND p > 9")
      q.processAllAvailable()
      assert(actual(mv) === expected(src))
    } finally {
      q.stop()
      spark.conf.unset("graft.cole.cdf.materialize")
    }
  }

  test("guardrails: unversioned source, double create, not-an-mv refresh") {
    val plain = s"$warehouse/db/mv_plain"
    rows(0 until 10).coalesce(1).write.format("cole").mode("overwrite")
      .save(plain)
    assert(intercept[IllegalArgumentException] {
      ColeMv.create(spark, plain, s"$warehouse/db/mv_plain_agg",
        Seq("k"), aggs)
    }.getMessage.contains("versioning"))
    val src = mkSource("mv_guard", 0 until 10)
    val mv = s"$warehouse/db/mv_guard_agg"
    ColeMv.create(spark, src, mv, Seq("k"), aggs)
    assert(intercept[IllegalArgumentException] {
      ColeMv.create(spark, src, mv, Seq("k"), aggs)
    }.getMessage.contains("already an MV"))
    assert(intercept[IllegalArgumentException] {
      ColeMv.refresh(spark, src, "mvw.db.mv_guard")
    }.getMessage.contains("not a materialized view"))
    assert(intercept[IllegalArgumentException] {
      ColeMv.parseAggs("median:v")
    }.getMessage.contains("unknown aggregate kind"))
  }
}
