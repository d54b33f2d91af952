package graft.sources.cole

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Version-log checkpoints (r13): cold-start planning on a long-lived
  * table reads latest-checkpoint + tail, not every record since table
  * birth; `expire_versions(prune_log=>true)` then bounds the log itself.
  * Pinned here:
  *   - auto-checkpoints appear every `checkpoint.intervalCommits` commits
  *     and a COLD fold of the current state costs O(tail) record reads
  *     (counted via [[ColeVersions.recordReads]]);
  *   - every fold (snapshot, time travel above the floor, dv state,
  *     rollback) is byte-identical with and without the checkpoint;
  *   - pruning deletes exactly the records at or below the horizon's
  *     checkpoint, keeps current reads exact, and turns every read that
  *     would need a pruned record into a LOUD error (time travel below
  *     the floor, feed ranges crossing it) — never a silent partial fold.
  */
class ColeCheckpointSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("auto-checkpoint: 230-commit table cold-plans the current state in O(tail) record reads") {
    val t = Files.createTempDirectory("cole_ckpt").toString
    val conf = new Configuration() // default interval: 100 commits
    val (fs, _) = ColeIO.resolve(t, conf)
    ColeVersions.enable(t, conf) // v1: empty baseline
    // synthetic metadata commits: every 10th removes the file added 5
    // commits earlier (records are deltas; no physical files needed to
    // exercise the fold)
    (1 to 230).foreach { i =>
      val removes =
        if (i % 10 == 0) Seq(s"f${i - 5}.col" -> s"retired/s$i/f${i - 5}.col")
        else Seq.empty
      ColeVersions.commitIfEnabled(t, conf, "append",
        Seq(s"f$i.col"), removes)
    }
    val cur = ColeVersions.currentVersion(t, conf)
    assert(cur === 231L)
    // interval=100 with commits at v2..v231: checkpoints at v100 and v200
    assert(ColeVersions.checkpointSeqs(t, conf) === Seq(100L, 200L))
    def expectedLiveAt(version: Long): Seq[String] = {
      // commit i wrote record i+1 (baseline is v1)
      val n = (version - 1).toInt
      (1 to n).map(i => s"f$i.col")
        .filterNot(f => (1 to n).exists(i => i % 10 == 0 &&
          f == s"f${i - 5}.col"))
    }
    // COLD driver: drop every cached parse, then plan the current state.
    // recordReads is process-global — take the min of three runs so a
    // concurrently-running suite's parses can't fail the bound
    val coldReads = (0 until 3).map { _ =>
      ColeVersions.invalidateCache(fs, t)
      val before = ColeVersions.recordReads.get()
      ColeVersions.snapshotAt(t, conf, cur)
      ColeVersions.recordReads.get() - before
    }.min
    val snap = ColeVersions.snapshotAt(t, conf, cur)
    assert(snap.map(_._1) === expectedLiveAt(cur))
    // fold base = ckpt-v200, tail = 31 records, nothing above v231
    assert(coldReads <= 40L,
      s"cold current-state plan read $coldReads records; " +
        "expected O(tail since checkpoint), not O(231 history)")
    assert(coldReads >= 31L, "the tail itself must still be read")
    // time travel BETWEEN checkpoints folds from the lower one, exact
    assert(ColeVersions.snapshotAt(t, conf, 150L).map(_._1)
      === expectedLiveAt(150L))
    // time travel BELOW the first checkpoint still folds from birth
    assert(ColeVersions.snapshotAt(t, conf, 50L).map(_._1)
      === expectedLiveAt(50L))
    // retired-path resolution is unaffected: a file removed AFTER the
    // version resolves at its first removal's retired path
    val v94 = ColeVersions.snapshotAt(t, conf, 94L) // f95 added at v96
    val snap96 = ColeVersions.snapshotAt(t, conf, 96L)
    assert(snap96.collectFirst { case ("f95.col", p) => p }.get
      .contains("retired/s100/f95.col"),
      "f95 (removed at v101) must resolve at its retired path")
    assert(!v94.exists(_._1 == "f95.col"))
  }

  test("manual checkpoint + prune_log: current reads exact, pruned range loud, history starts at the floor") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("cole_ckpt_wh").toString
    s.conf.set("spark.sql.catalog.ckpt", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.ckpt.warehouse", wh)
    val t = s"$wh/db/t"
    val conf = ColeIO.driverConf()
    (0 until 400).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(2)
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    (400 until 500).map(i => (i.toLong, 1L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v2
    s.sql("DELETE FROM ckpt.db.t WHERE k < 50") // v3
    s.sql("UPDATE ckpt.db.t SET v = 9 WHERE k >= 450") // v4
    (500 until 600).map(i => (i.toLong, 2L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v5
    // snapshots BEFORE any checkpoint exists, as ground truth
    val truth = (1L to 5L).map(v =>
      v -> ColeVersions.snapshotAt(t, conf, v)).toMap
    val rowsV4 = s.read.format("cole").option("versionAsOf", "4").load(t)
      .agg(sum("v")).head.getLong(0)
    // CALL the checkpoint procedure (same path a cron would use)
    val ck = s.sql("CALL ckpt.system.checkpoint('db.t')").head.getLong(0)
    assert(ck === 5L)
    assert(ColeVersions.checkpointSeqs(t, conf) === Seq(5L))
    // every fold is identical with the checkpoint in place
    val (fs, _) = ColeIO.resolve(t, conf)
    ColeVersions.invalidateCache(fs, t)
    (1L to 5L).foreach { v =>
      assert(ColeVersions.snapshotAt(t, conf, v) === truth(v),
        s"snapshot at v$v drifted after checkpointing")
    }
    assert(s.read.format("cole").option("versionAsOf", "4").load(t)
      .agg(sum("v")).head.getLong(0) === rowsV4)
    // more history above the checkpoint, then rollback ACROSS it
    s.sql("DELETE FROM ckpt.db.t WHERE k >= 550") // v6
    ColeVersions.rollback(t, conf, 4L) // v7 = state of v4
    assert(s.table("ckpt.db.t").count() === 450L) // v4: k in [50, 500)
    assert(s.table("ckpt.db.t").agg(sum("v")).head.getLong(0) === rowsV4)
    // expire everything old enough, pruning the log below the horizon
    Thread.sleep(50)
    s.sql("CALL ckpt.system.expire_versions('db.t', 0, 3, true)").collect()
    val horizon = ColeVersions.expiryHorizon(t, conf)
    assert(horizon === 4L, s"keep_last=3 of 7 versions -> horizon v4")
    // a checkpoint at the horizon now anchors the fold; records <= 4 gone
    assert(ColeVersions.checkpointSeqs(t, conf).contains(4L))
    assert(ColeVersions.records(t, conf).map(_.version) === Seq(5L, 6L, 7L))
    // current state still exact (v7 = rolled-back v4 content)
    assert(s.table("ckpt.db.t").count() === 450L)
    assert(s.table("ckpt.db.t").agg(sum("v")).head.getLong(0) === rowsV4)
    // $history starts at the floor
    assert(s.sql("SELECT min(version) FROM ckpt.db.`t$history`")
      .head.getLong(0) === 5L)
    // time travel above the floor unchanged; below it LOUD
    assert(s.read.format("cole").option("versionAsOf", "5").load(t)
      .count() === 550L) // v5: v4's 450 rows + the 100-row append
    val e1 = intercept[Exception] {
      s.read.format("cole").option("versionAsOf", "2").load(t).count()
    }
    assert(e1.getMessage.contains("does not exist"),
      s"pruned version must be loud, got: ${e1.getMessage}")
    // a feed range crossing the floor is refused, never silently partial
    val e2 = intercept[Exception] {
      ColeVersions.changedFiles(t, conf, 1L, 5L)
    }
    assert(e2.getMessage.contains("does not exist") ||
      e2.getMessage.contains("pruned") ||
      e2.getMessage.contains("reconstructible"),
      s"unexpected: ${e2.getMessage}")
    // fold continuity: snapshot below the floor is loud too
    val e3 = intercept[Exception] {
      ColeVersions.snapshotAt(t, conf, 3L)
    }
    assert(e3.getMessage.contains("not reconstructible") ||
      e3.getMessage.contains("does not exist"), s"got: ${e3.getMessage}")
    // an aggressive prune (keep_last 0, everything expired) must still
    // keep the NEWEST record: it anchors the commit CAS — pruning it
    // would re-mint used sequence numbers against the checkpoint
    Thread.sleep(50)
    s.sql("CALL ckpt.system.expire_versions('db.t', 0, 0, true)").collect()
    val recsLeft = ColeVersions.records(t, conf).map(_.version)
    assert(recsLeft.nonEmpty && recsLeft.max === 7L,
      s"newest record must survive any prune, got $recsLeft")
    (600 until 650).map(i => (i.toLong, 9L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v8, NOT v1
    assert(ColeVersions.currentVersion(t, conf) === 8L)
    assert(s.table("ckpt.db.t").count() === 500L)
  }

  test("CDF stream resumed from a checkpoint below the prune floor refuses loudly (never a silent skip)") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("cole_ckpt_cdf").toString
    s.conf.set("spark.sql.catalog.ckcdf", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.ckcdf.warehouse", wh)
    val t = s"$wh/db/t"
    val conf = ColeIO.driverConf()
    (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    (100 until 200).map(i => (i.toLong, 1L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v2
    // stream the feed to v2, checkpointed; no consumerId — retention is
    // NOT pinned, exactly the misconfiguration the guard protects
    val cp = Files.createTempDirectory("cole_ckpt_cdf_cp").toString
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    def run(): Unit = {
      val q = s.readStream.format("cole").option("changeFeed", "true")
        .load(t)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            seen.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", cp)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(seen.get() === 200L)
    // while the stream is DOWN: more commits, then expire + prune the
    // log below a floor ABOVE the stream's checkpointed offset
    (200 until 300).map(i => (i.toLong, 2L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v3
    (300 until 400).map(i => (i.toLong, 3L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v4
    Thread.sleep(50)
    ColeVersions.vacuumRetired(t, conf, 0L, keepLast = 1, pruneLog = true)
    assert(ColeVersions.expiryHorizon(t, conf) === 3L)
    assert(ColeVersions.records(t, conf).map(_.version) === Seq(4L))
    // the resume must refuse loudly — commit v3's rows are gone from the
    // log; serving only v4 would silently skip them
    val e = intercept[Exception] { run() }
    def chain(x: Throwable): Seq[String] =
      Iterator.iterate(x)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("no longer all present")),
      s"expected the loud continuity refusal, got: ${e.getMessage}")
    assert(seen.get() === 200L, "no partial batch may have been served")
  }

  test("a repairTorn gap stays foldable: time travel, checkpoints and feeds work across the quarantined seq") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("cole_ckpt_torn").toString
    s.conf.set("spark.sql.catalog.cktorn", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cktorn.warehouse", wh)
    val t = s"$wh/db/t"
    val conf = ColeIO.driverConf()
    (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    (100 until 200).map(i => (i.toLong, 1L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v2
    // a crash mid-record-write leaves a TORN v3 (no terminal line)...
    val (fs, _) = ColeIO.resolve(t, conf)
    val tornP = new org.apache.hadoop.fs.Path(
      s"$t/${ColeVersions.DirName}/v000000000003")
    val out = fs.create(tornP, false)
    try out.write("ts:1\nop:crashed\nadd:ghost.col".getBytes)
    finally out.close()
    // ...a later commit lands ABOVE it (the CAS skips to the next seq)
    (200 until 300).map(i => (i.toLong, 2L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v4
    // reads below the torn record refuse loudly until repair
    intercept[Exception] { ColeVersions.records(t, conf) }
    assert(ColeVersions.repairTorn(t, conf) === Seq("v000000000003"))
    // the quarantined seq is a permanent GAP — every fold above it must
    // keep working (its delta never committed, so skipping it is exact)
    assert(ColeVersions.snapshotAt(t, conf, 4L).size === 3)
    assert(s.read.format("cole").option("versionAsOf", "4").load(t)
      .count() === 300L)
    assert(s.read.format("cole").option("versionAsOf", "2").load(t)
      .count() === 200L)
    assert(ColeVersions.changedFiles(t, conf, 2L, 4L).size === 1)
    assert(ColeVersions.checkpoint(t, conf) === 4L)
    // folds FROM the checkpoint keep working, and new commits land
    val (fs2, _) = ColeIO.resolve(t, conf)
    ColeVersions.invalidateCache(fs2, t)
    assert(ColeVersions.snapshotAt(t, conf, 4L).size === 3)
    (300 until 350).map(i => (i.toLong, 3L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v5
    assert(ColeVersions.currentVersion(t, conf) === 5L)
    assert(s.table("cktorn.db.t").count() === 350L)
  }

  test("checkpoint carries the dv map: vector DELETE state survives a pruned prefix") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("cole_ckpt_dv").toString
    s.conf.set("spark.sql.catalog.ckdv", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.ckdv.warehouse", wh)
    val t = s"$wh/db/t"
    val conf = ColeIO.driverConf()
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    ColeDv.setMode(t, conf, "vector")
    s.sql("DELETE FROM ckdv.db.t WHERE k < 100") // v2: MOR vector
    (1000 until 1100).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v3
    s.sql("DELETE FROM ckdv.db.t WHERE k >= 1050") // v4: second vector
    assert(ColeVersions.checkpoint(t, conf) === 4L)
    val (fs, _) = ColeIO.resolve(t, conf)
    ColeVersions.invalidateCache(fs, t)
    // the dv fold from the checkpoint equals the record fold
    assert(ColeVersions.dvAsOf(t, conf, 4L).nonEmpty)
    assert(s.table("ckdv.db.t").count() === 950L)
    // snapshot read THROUGH the checkpointed dv state
    assert(s.read.format("cole").option("versionAsOf", "4").load(t)
      .count() === 950L)
    assert(s.read.format("cole").option("versionAsOf", "3").load(t)
      .count() === 1000L)
  }
}
