package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming row-level change feed (r10):
  * `readStream.format("cole").option("changeFeed", "true")` serves every
  * commit of a versioned table as `_change_type`/`_commit_version` rows
  * with the batch feed's exact semantics —
  *   - pure-add commits as inserts,
  *   - merge-on-read commits delta-exactly from pinned ordinals (the
  *     serve-side answer to the vector-mode tailing refusal),
  *   - copy-on-write commits from MATERIALIZED change files
  *     ([[ColeChangeFeed.materialize]]): refused loudly when absent,
  *     served after `materialize_cdf` backfill or with the
  *     `graft.cole.cdf.materialize` conf armed at DML time,
  *   - offsets are commit versions: restart resumes, backlog paces by
  *     `maxCommitsPerTrigger`.
  * Materialized change data follows the `expire_versions` horizon: an
  * expired commit drops its images with its retired bytes (one
  * retention policy, no unbounded cdf growth) and the feed fails
  * loudly on the expired range.
  */
class ColeCdfStreamSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_cdf_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.cdf", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cdf.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** Run the CDF stream to exhaustion into a memory sink, return its
    * rows.
    */
  private def streamAll(dir: String, name: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val cp = Files.createTempDirectory(s"cole_cdf_cp_$name").toString
    val reader = spark.readStream.format("cole")
      .option("changeFeed", "true")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  private def canon(df: DataFrame): Seq[Row] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .sortBy(_.mkString("|")).toSeq
  }

  test("latestOffset never advances past an IN-FLIGHT commit record") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/inflight"
    (0 until 20).map(i => (i.toLong, 1)).toDF("k", "b").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.inflight')") // v1
    // a committer's record file is LISTABLE the moment its exclusive
    // create lands, before the body (and terminal `end`) flushes — hold
    // that window open by hand: a v2 record with no `end`
    val inflight = java.nio.file.Paths.get(
      s"$t/${ColeVersions.DirName}/v${"%012d".format(2)}")
    java.nio.file.Files.writeString(inflight,
      s"ts:${System.currentTimeMillis()}\nop:delete\nrm:a|retired/x/a\n")
    try {
      val schema = spark.read.format("cole").load(t).schema
      val stream = new ColeCdfScan(schema, t, conf)
        .toMicroBatchStream(Files.createTempDirectory("cdf_inflight_cp").toString)
        .asInstanceOf[ColeCdfMicroBatchStream]
      // a poll in the window must cap at v1 (the last COMPLETE record),
      // never at the raw max sequence — pre-fix it returned 2 and the
      // batch (1, 2] then planned a commit recordsFrom cannot yet see
      // (flaky defer skips / spurious dense-continuity failures)
      val end = stream.latestOffset(ColeCdfOffset(1L),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      assert(end.asInstanceOf[ColeCdfOffset].version === 1L,
        "offset must not advance past an in-flight record")
    } finally java.nio.file.Files.delete(inflight)
    // window closed (commit completed): the next poll admits it
    (20 until 30).map(i => (i.toLong, 2)).toDF("k", "b").coalesce(1)
      .write.format("cole").mode("append").save(t) // a real v2
    val stream2 = new ColeCdfScan(
      spark.read.format("cole").load(t).schema, t, conf)
      .toMicroBatchStream(Files.createTempDirectory("cdf_inflight_cp2").toString)
      .asInstanceOf[ColeCdfMicroBatchStream]
    val end2 = stream2.latestOffset(ColeCdfOffset(1L),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(end2.asInstanceOf[ColeCdfOffset].version === 2L)
    // an in-flight record BELOW a complete one (disjoint committer B
    // landed v3 while A's v2... er, v3 while v2's body was unflushed)
    // parses as "torn" for microseconds — an idle poll must HOLD, not
    // kill the stream; the commit completing lets the next poll advance
    (30 until 40).map(i => (i.toLong, 3)).toDF("k", "b").coalesce(1)
      .write.format("cole").mode("append").save(t) // a real v3
    val interior = java.nio.file.Paths.get(
      s"$t/${ColeVersions.DirName}/v${"%012d".format(3)}")
    val bytes = java.nio.file.Files.readAllBytes(interior)
    val txt = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    // out-of-band mutation: drop the Hadoop checksum sidecar too
    val crc = interior.getParent.resolve(s".${interior.getFileName}.crc")
    def mutate(content: String): Unit = {
      java.nio.file.Files.writeString(interior, content)
      java.nio.file.Files.deleteIfExists(crc)
    }
    mutate(txt.stripSuffix("end")) // reopen the window: v3 loses its terminal
    try {
      val stream3 = new ColeCdfScan(
        spark.read.format("cole").load(t).schema, t, conf)
        .toMicroBatchStream(Files.createTempDirectory("cdf_inflight_cp3").toString)
        .asInstanceOf[ColeCdfMicroBatchStream]
      // v4 complete above the in-flight v3 → recordsFrom sees torn
      (40 until 50).map(i => (i.toLong, 4)).toDF("k", "b").coalesce(1)
        .write.format("cole").mode("append").save(t)
      val held = stream3.latestOffset(ColeCdfOffset(2L),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      assert(held.asInstanceOf[ColeCdfOffset].version === 2L,
        "a poll over a transiently-torn log must hold, not throw")
      // the window closes: the next poll advances over everything
      mutate(txt)
      val after = stream3.latestOffset(ColeCdfOffset(2L),
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      assert(after.asInstanceOf[ColeCdfOffset].version === 4L)
    } finally {
      mutate(txt) // restore regardless
    }
  }

  test("append-only history streams as inserts, parity with the batch feed") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/ins"
    (0 until 100).map(i => (i.toLong, i % 7)).toDF("k", "g").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.ins')") // v1 baseline
    (100 until 130).map(i => (i.toLong, i % 7)).toDF("k", "g").coalesce(1)
      .write.format("cole").mode("append").save(t)    // v2 append
    val out = streamAll(t, "cdf_ins")
    assert(out.count() === 130L)
    assert(out.filter(col(ColeChangeFeed.ChangeTypeCol) =!= "insert").count() === 0L)
    assert(out.filter(col(ColeChangeFeed.CommitVersionCol) === 2L).count() === 30L)
    val batch = ColeChangeFeed.read(spark, t, 0L,
      ColeVersions.currentVersion(t, conf))
    assert(canon(out) === canon(batch), "stream must equal the batch feed")
  }

  test("vector DELETE streams delta-exact delete rows (the vector-mode serve path)") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/vdel"
    (0 until 200).map(i => (i.toLong, i % 3)).toDF("k", "g").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.vdel')")
    spark.sql("CALL cdf.system.delete_mode('db.vdel', 'vector')")
    spark.sql("DELETE FROM cdf.db.vdel WHERE k >= 150") // v2: pure-vector commit
    val out = streamAll(t, "cdf_vdel")
    val dels = out.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
    assert(dels.count() === 50L)
    assert(dels.agg(min("k"), max("k")).head() === Row(150L, 199L))
    assert(dels.filter(col(ColeChangeFeed.CommitVersionCol) === 2L).count() === 50L)
    val batch = ColeChangeFeed.read(spark, t, 0L,
      ColeVersions.currentVersion(t, conf))
    assert(canon(out) === canon(batch))
  }

  test("merge-on-read MERGE streams deletes from fresh ordinals plus image inserts") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/mor"
    (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.mor')")
    spark.sql("CALL cdf.system.delete_mode('db.mor', 'vector')")
    (40 until 60).map(i => (i.toLong, 1L)).toDF("k", "v")
      .createOrReplaceTempView("cdf_mor_src")
    spark.sql(
      """MERGE INTO cdf.db.mor t USING cdf_mor_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin) // v2: dvs + adds
    val out = streamAll(t, "cdf_mor")
    val v2 = out.filter(col(ColeChangeFeed.CommitVersionCol) === 2L)
    assert(v2.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
      .agg(count(lit(1)), sum("v")).head() === Row(20L, 0L),
      "deletes are the 20 OLD images")
    assert(v2.filter(col(ColeChangeFeed.ChangeTypeCol) === "insert")
      .agg(count(lit(1)), sum("v")).head() === Row(20L, 20L),
      "inserts are the 20 NEW images")
    val batch = ColeChangeFeed.read(spark, t, 0L,
      ColeVersions.currentVersion(t, conf))
    assert(canon(out) === canon(batch))
  }

  test("copy-on-write UPDATE: refused un-materialized, served after materialize_cdf backfill") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/cow"
    (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.cow')")
    spark.sql("UPDATE cdf.db.cow SET v = 5 WHERE k < 10") // v2: COW rewrite
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      streamAll(t, "cdf_cow_refuse")
    }
    def rootMsg(e: Throwable): String =
      if (e.getCause == null) e.getMessage else e.getMessage + rootMsg(e.getCause)
    assert(rootMsg(err).contains("materialize"),
      "un-materialized COW commit must refuse with the way out")
    val n = spark.sql("CALL cdf.system.materialize_cdf('db.cow', 0)")
      .head().getLong(0)
    assert(n === 1L, "exactly the COW commit materializes")
    val out = streamAll(t, "cdf_cow")
    val v2 = out.filter(col(ColeChangeFeed.CommitVersionCol) === 2L)
    assert(v2.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
      .agg(count(lit(1)), sum("v")).head() === Row(10L, 0L))
    assert(v2.filter(col(ColeChangeFeed.ChangeTypeCol) === "insert")
      .agg(count(lit(1)), sum("v")).head() === Row(10L, 50L))
    // the batch feed serves the same rows FROM the materialized files
    val before = ColeChangeFeed.materializedServes.get()
    val batch = ColeChangeFeed.read(spark, t, 0L,
      ColeVersions.currentVersion(t, conf))
    assert(canon(out) === canon(batch))
    assert(ColeChangeFeed.materializedServes.get() > before,
      "batch feed must serve the materialized images, not re-diff")
  }

  test("graft.cole.cdf.materialize: DML commits write change files, stream needs no backfill") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/auto"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.auto')")
    spark.conf.set(ColeChangeFeed.MaterializeKey, "true")
    try {
      spark.sql("DELETE FROM cdf.db.auto WHERE k >= 90") // v2: COW delete
      assert(ColeChangeFeed.isMaterialized(t, conf, 2L),
        "the DML commit must have materialized its images")
      val out = streamAll(t, "cdf_auto")
      val dels = out.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
      assert(dels.count() === 10L)
      assert(dels.agg(min("k")).head().getLong(0) === 90L)
    } finally spark.conf.unset(ColeChangeFeed.MaterializeKey)
  }

  test("materialize-armed stream DEFERS an image-less COW commit instead of dying") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/defer"
    (0 until 100).map(i => (i.toLong, i % 5)).toDF("k", "g").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.defer')") // v1
    // an ARMED stream: it declares the intent "every COW commit will be
    // materialized by its committer — wait for the images"
    spark.conf.set(ColeChangeFeed.MaterializeKey, "true")
    val cp = Files.createTempDirectory("cole_cdf_cp_defer").toString
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .load(t)
      .writeStream.format("memory").queryName("cdf_defer")
      .option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable() // v1 served
      assert(spark.table("cdf_defer").count() === 100L)
      // the race window, held open: a COW delete whose committer has
      // written its record but NOT YET its change files (simulated by
      // running the DML with the materialize conf off — the stream's
      // own conf stays armed from its creation)
      spark.conf.unset(ColeChangeFeed.MaterializeKey)
      spark.sql("DELETE FROM cdf.db.defer WHERE k >= 90") // v2, image-less
      assert(!ColeChangeFeed.isMaterialized(t, conf, 2L))
      // FREEZE the grace clock at the commit's own stamp (r15 deflake):
      // the defer decision is `now - r.ts < grace`, and on a loaded box
      // real polls could land arbitrarily late — the injected clock
      // makes the in-grace window a fact, not a race
      val recTs = ColeVersions.records(t, conf).find(_.version == 2L).get.ts
      ColeCdfStreamConf.clock = () => recTs + 1
      // pre-fix the stream DIED here planning v2; now it must WAIT —
      // caught up with nothing served past v1, and still alive
      q.processAllAvailable()
      assert(q.isActive, "an armed stream must defer, not die")
      assert(spark.table("cdf_defer")
        .filter(col(ColeChangeFeed.ChangeTypeCol) === "delete").count() === 0L)
      // the committer's images land (backfill == the delayed write)
      spark.sql("CALL cdf.system.materialize_cdf('db.defer', 2)")
      q.processAllAvailable()
      val dels = spark.table("cdf_defer")
        .filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
      assert(dels.count() === 10L)
      assert(dels.agg(min("k")).head().getLong(0) === 90L)
    } finally {
      q.stop()
      ColeCdfStreamConf.clock = () => System.currentTimeMillis()
      spark.conf.unset(ColeChangeFeed.MaterializeKey)
    }
  }

  test("materialize-armed stream ADMITS an image-less commit past the grace — loudly") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/defergrace"
    (0 until 50).map(i => (i.toLong, i % 5)).toDF("k", "g").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.defergrace')") // v1
    spark.conf.set(ColeChangeFeed.MaterializeKey, "true")
    val cp = Files.createTempDirectory("cole_cdf_cp_defergrace").toString
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .load(t)
      .writeStream.format("memory").queryName("cdf_defergrace")
      .option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable() // v1 served
      spark.conf.unset(ColeChangeFeed.MaterializeKey)
      spark.sql("DELETE FROM cdf.db.defergrace WHERE k >= 40") // image-less
      // the injected clock jumps PAST the grace: the committer evidently
      // died — the stream must admit the commit and fail LOUDLY with the
      // backfill recipe, deterministically (no sleeping through a real
      // ten-minute grace)
      val recTs = ColeVersions.records(t, conf)
        .find(_.version == 2L).get.ts
      val grace = ColeCdfStreamConf.DefaultMaterializeGraceMs
      ColeCdfStreamConf.clock = () => recTs + grace + 1
      val e = intercept[Exception](q.processAllAvailable())
      def msgs(x: Throwable): Seq[String] = Option(x).toSeq.flatMap(y =>
        Option(y.getMessage).toSeq ++ msgs(y.getCause))
      assert(msgs(e).exists(_.contains("materialize_cdf")),
        s"expected the backfill recipe in the loud admit, got: " +
          msgs(e).mkString(" | "))
    } finally {
      q.stop()
      ColeCdfStreamConf.clock = () => System.currentTimeMillis()
      spark.conf.unset(ColeChangeFeed.MaterializeKey)
    }
  }

  test("startingVersion skips history; maxCommitsPerTrigger paces the backlog") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pace"
    (0 until 10).map(i => (i.toLong, 1)).toDF("k", "b").coalesce(1)
      .write.format("cole").mode("overwrite").save(t) // v1 via baseline
    spark.sql("CALL cdf.system.versioning('db.pace')")
    (2 to 4).foreach { b =>
      (0 until 10).map(i => (i.toLong, b)).toDF("k", "b").coalesce(1)
        .write.format("cole").mode("append").save(t) // v2..v4
    }
    val out = streamAll(t, "cdf_pace",
      Map("startingVersion" -> "3", "maxCommitsPerTrigger" -> "1"))
    assert(out.count() === 20L, "only v3 and v4 serve")
    assert(out.agg(min(ColeChangeFeed.CommitVersionCol),
      max(ColeChangeFeed.CommitVersionCol)).head() === Row(3L, 4L))
    // pacing: 1 commit per micro-batch → the two commits arrive in two
    // distinct batches (memory sink records batchIds via progress)
    val cp = Files.createTempDirectory("cole_cdf_cp_pace2").toString
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .option("startingVersion", "1").option("maxCommitsPerTrigger", "1")
      .load(t)
      .writeStream.format("memory").queryName("cdf_pace2")
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("cdf_pace2").count() === 40L)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "four commits at one per trigger need at least four non-empty batches")
  }

  test("restart from checkpoint resumes at the next commit (file sink, no replay)") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/resume"
    val sink = Files.createTempDirectory("cole_cdf_sink").toString
    val cp = Files.createTempDirectory("cole_cdf_cp_resume").toString
    (0 until 10).map(i => (i.toLong, 1)).toDF("k", "b").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.resume')") // v1
    def run(): Unit = {
      val q = spark.readStream.format("cole").option("changeFeed", "true")
        .load(t)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    (10 until 20).map(i => (i.toLong, 2)).toDF("k", "b").coalesce(1)
      .write.format("cole").mode("append").save(t) // v2 while offline
    run()
    val rows = spark.read.parquet(sink)
    assert(rows.count() === 20L, "each commit exactly once across restarts")
    assert(rows.groupBy(ColeChangeFeed.CommitVersionCol).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap ===
      Map(1L -> 10L, 2L -> 10L))
  }

  test("Trigger.AvailableNow drains the backlog and terminates on its own") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/avnow"
    (0 until 60).map(i => (i.toLong, i % 3)).toDF("k", "g").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.avnow')")
    spark.sql("CALL cdf.system.delete_mode('db.avnow', 'vector')")
    spark.sql("DELETE FROM cdf.db.avnow WHERE k < 6") // v2
    val cp = Files.createTempDirectory("cole_cdf_cp_avnow").toString
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .option("maxCommitsPerTrigger", "1") // forces multiple batches
      .load(t)
      .writeStream.format("memory").queryName("cdf_avnow")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow must self-terminate")
    val out = spark.table("cdf_avnow")
    assert(out.count() === 66L) // 60 inserts + 6 deletes
    assert(out.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
      .count() === 6L)
  }

  test("vector feed plans ONE scan per commit — ordinal probes never plan-embedded") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/shape"
    // four files, so a per-file-DataFrame shape would show 4+ scans and
    // 4 embedded local relations per commit — the sf1 wedge this pins
    (0 until 4000).map(i => (i.toLong, i % 7)).toDF("k", "g").repartition(4)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.shape')")
    spark.sql("CALL cdf.system.delete_mode('db.shape', 'vector')")
    spark.sql("DELETE FROM cdf.db.shape WHERE k % 10 = 3") // v2, all 4 files
    spark.sql("DELETE FROM cdf.db.shape WHERE k % 10 = 4") // v3, all 4 files
    val feed = ColeChangeFeed.read(spark, t, 1L, 3L)
    val plan = feed.queryExecution.optimizedPlan.toString
    val scans = "cole:".r.findAllIn(plan).length
    assert(scans <= 2, s"expected one cole scan per vector commit, got $scans:\n$plan")
    assert(!plan.contains("LocalRelation"),
      "ordinal probes must not be plan-embedded local relations")
    // and the rows stay exact
    assert(feed.count() === 800L)
  }

  test("materialized change data follows the expire_versions horizon") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/keep"
    (0 until 50).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL cdf.system.versioning('db.keep')")
    spark.sql("UPDATE cdf.db.keep SET v = 1 WHERE k < 5") // v2 COW
    spark.sql("CALL cdf.system.materialize_cdf('db.keep', 2)")
    // a horizon that expires nothing keeps the images — the feed serves
    spark.sql("CALL cdf.system.expire_versions('db.keep', 1)")
    assert(ColeChangeFeed.isMaterialized(t, conf, 2L))
    val feed = ColeChangeFeed.read(spark, t, 1L, 2L)
    assert(feed.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete").count() === 5L)
    assert(feed.filter(col(ColeChangeFeed.ChangeTypeCol) === "insert").count() === 5L)
    // expiring the commit expires its change data WITH its retired
    // bytes (one horizon — the cdf tree cannot grow unbounded), and the
    // feed on the expired range fails loudly rather than half-serves
    spark.sql("CALL cdf.system.expire_versions('db.keep', 0)")
    assert(!ColeChangeFeed.isMaterialized(t, conf, 2L),
      "expired commits must drop their materialized change data")
    val err = intercept[Exception] {
      ColeChangeFeed.read(spark, t, 1L, 2L)
        .filter(col(ColeChangeFeed.ChangeTypeCol) === "delete").count()
    }
    assert(err.getMessage.contains("no longer readable") ||
      err.getMessage.contains("reconstructible"),
      s"expected a loud expiry error, got: ${err.getMessage}")
  }

  test("pairUpdates: streamed four-type shape matches the batch pairKey feed, at commit boundaries and across multi-commit batches") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pairs"
    (0 until 300).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    s.sql("CALL cdf.system.versioning('db.pairs')") // v1 baseline
    s.sql("CALL cdf.system.delete_mode('db.pairs', 'vector')")
    (250 until 350).map(i => (i.toLong, i.toLong * 10)).toDF("id", "nv")
      .createOrReplaceTempView("cdf_pairs_src")
    s.sql("""MERGE INTO cdf.db.pairs t USING cdf_pairs_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.nv
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""") // v2 MOR
    (400 until 420).map(i => (i.toLong, 0L)).toDF("id", "v")
      .write.format("cole").mode("append").save(t) // v3 pure add
    s.sql("DELETE FROM cdf.db.pairs WHERE id % 50 = 3") // v4 vector delete

    val expected = ColeChangeFeed.read(s, t, 0L, 4L, pairKey = Seq("id"))
      .select("id", "v", ColeChangeFeed.ChangeTypeCol,
        ColeChangeFeed.CommitVersionCol)
      .collect().map(_.toSeq).sortBy(_.toString)

    def streamedPairs(name: String, opts: Map[String, String]): Array[Seq[Any]] = {
      val cp = Files.createTempDirectory(s"cole_cdf_pairs_$name").toString
      val buf = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      val reader = spark.readStream.format("cole").option("changeFeed", "true")
      opts.foreach { case (k, v) => reader.option(k, v) }
      val q = reader.load(t)
        .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
          val p = ColeCdfStream.pairUpdates(b, Seq("id"))
            .select("id", "v", ColeChangeFeed.ChangeTypeCol,
              ColeChangeFeed.CommitVersionCol).collect()
          buf.synchronized { buf ++= p.map(_.toSeq) }; ()
        }
        .option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
      buf.sortBy(_.toString).toArray
    }

    // one commit per micro-batch: pairing is commit-local by
    // construction, so per-batch pairing is exact at every boundary
    assert(streamedPairs("paced",
      Map("maxCommitsPerTrigger" -> "1")).toSeq === expected.toSeq)
    // the whole history in one batch: the commit version participates
    // in the pairing key, so commits never pair across each other
    assert(streamedPairs("wide", Map.empty).toSeq === expected.toSeq)
    // idempotent: re-pairing already-paired rows is the identity
    val once = ColeCdfStream.pairUpdates(
      ColeChangeFeed.read(s, t, 0L, 4L), Seq("id"))
    val twice = ColeCdfStream.pairUpdates(once, Seq("id"))
    assert(once.groupBy(ColeChangeFeed.ChangeTypeCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      twice.groupBy(ColeChangeFeed.ChangeTypeCol).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("bootstrap recipe: versionAsOf N + startingVersion N+1 reconstructs the live table, gap-free and overlap-free") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/boot"
    (0 until 400).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    s.sql("CALL cdf.system.versioning('db.boot')") // v1
    s.sql("CALL cdf.system.delete_mode('db.boot', 'vector')")
    s.sql("DELETE FROM cdf.db.boot WHERE id < 40") // v2 (before the seam)
    val N = ColeVersions.currentVersion(t, conf) // = 2
    // history continues past the seam: an append and another delete
    (500 until 560).map(i => (i.toLong, 1L)).toDF("id", "v")
      .write.format("cole").mode("append").save(t) // v3
    s.sql("DELETE FROM cdf.db.boot WHERE id % 100 = 50") // v4

    // THE new-consumer recipe: batch-load the snapshot AS OF N, then
    // stream changes with startingVersion N+1 — never the full history
    val snap = spark.read.format("cole")
      .option("versionAsOf", N.toString).load(t)
    val changes = streamAll(t, "cdf_boot_changes",
      Map("startingVersion" -> (N + 1).toString))

    // overlap-free: no streamed commit at or below N
    assert(changes.agg(min(col(ColeChangeFeed.CommitVersionCol))).head.getLong(0) === N + 1)
    // gap-free: snapshot ∪ inserts minus deletes == live table (multiset)
    val ins = changes.filter(col(ColeChangeFeed.ChangeTypeCol) === "insert")
      .select("id", "v")
    val del = changes.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
      .select("id", "v")
    val rebuilt = snap.select("id", "v").unionByName(ins).exceptAll(del)
    val live = spark.read.format("cole").load(t).select("id", "v")
    assert(rebuilt.exceptAll(live).count() === 0L)
    assert(live.exceptAll(rebuilt).count() === 0L)
    assert(rebuilt.count() === live.count())
  }
}
