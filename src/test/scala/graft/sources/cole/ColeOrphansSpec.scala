package graft.sources.cole

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `CALL cole.system.remove_orphan_files` (r14): crash leftovers —
  * landed-but-never-committed data files, dead dotted in-progress temps,
  * stray sidecars — age-guarded cleanup. Pinned here:
  *   - on a versioned table the FOLD decides liveness: an uncommitted
  *     `.col` is an orphan, every folded file survives;
  *   - dry_run lists exactly what the destructive run would take;
  *   - the age horizon protects anything younger (an in-flight write's
  *     files are never eligible);
  *   - live files' sidecars, `_`-prefixed layout/state trees (version
  *     log, claims, branch staging) are never touched;
  *   - on an unversioned table the listing IS live: only non-`.col` junk
  *     can be orphaned;
  *   - the table reads byte-identically after the sweep.
  */
class ColeOrphansSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_orph_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.orw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.orw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def plant(fs: org.apache.hadoop.fs.FileSystem, p: HPath,
      body: String, old: Boolean): Unit = {
    val out = fs.create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    if (old) fs.setTimes(p, System.currentTimeMillis() - 10 * 3600_000L, -1)
  }

  test("versioned table: fold decides liveness; age guard; dry run; survivors intact") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/orph"
    (0 until 20).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .coalesce(2).write.format("cole").mode("append").save(t)
    ColeVersions.enable(t, conf)
    val (fs, root) = ColeIO.resolve(t, conf)
    val sumBefore = spark.read.format("cole").load(t)
      .agg(sum("id")).head().getLong(0)
    // a crash leftover: valid .col bytes, never committed (copy a live
    // file — exactly what a job that died pre-commit leaves behind)
    val live = ColeIO.listPartitioned(t, conf).head._1.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
      new HPath(root, "part-lost.col"), false, true, fs.getConf)
    fs.setTimes(new HPath(root, "part-lost.col"),
      System.currentTimeMillis() - 10 * 3600_000L, -1)
    // a dead dotted in-progress temp and a stray sidecar of nothing
    plant(fs, new HPath(root, ".part-dead.col.inprogress"), "junk", old = true)
    plant(fs, new HPath(root, ".gone.col.dv"), "junk", old = true)
    // a YOUNG in-progress temp: inside the horizon, must survive
    plant(fs, new HPath(root, ".part-young.col.inprogress"), "young",
      old = false)

    // dry run lists all three old orphans, deletes nothing
    val dry = spark.sql(
      "CALL orw.system.remove_orphan_files('db.orph', 1, true)").collect()
    assert(dry.map(_.getString(0)).toSet ===
      Set("part-lost.col", ".part-dead.col.inprogress", ".gone.col.dv"))
    assert(fs.exists(new HPath(root, "part-lost.col")))

    val swept = spark.sql(
      "CALL orw.system.remove_orphan_files('db.orph', 1, false)").collect()
    assert(swept.map(_.getString(0)).toSet === dry.map(_.getString(0)).toSet)
    assert(!fs.exists(new HPath(root, "part-lost.col")))
    assert(!fs.exists(new HPath(root, ".part-dead.col.inprogress")))
    assert(fs.exists(new HPath(root, ".part-young.col.inprogress")),
      "age guard")
    // live data byte-identical; version log untouched
    assert(spark.read.format("cole").load(t).agg(sum("id")).head().getLong(0)
      === sumBefore)
    assert(ColeVersions.currentVersion(t, conf) === 1L)
    // idempotent: nothing left to find (the young temp is still young)
    assert(spark.sql(
      "CALL orw.system.remove_orphan_files('db.orph', 1, false)")
      .collect().isEmpty)
    fs.delete(new HPath(root, ".part-young.col.inprogress"), false)
  }

  test("live sidecars and branch staging survive; unversioned tables sweep only junk") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/orph2"
    (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("cole").mode("append").save(t)
    ColeVersions.enable(t, conf)
    val (fs, root) = ColeIO.resolve(t, conf)
    // a real bloom sidecar on a live file
    spark.sql("CALL orw.system.bloom_index('db.orph2', 's')")
    val liveAbs = ColeIO.listPartitioned(t, conf).head._1.getPath.toString
    val bloomP = new HPath(ColeBloomIndex.sidecarPath(liveAbs))
    assert(fs.exists(bloomP))
    fs.setTimes(bloomP, System.currentTimeMillis() - 10 * 3600_000L, -1)
    // staged branch data is connector state, never orphan-swept
    ColeRefs.createBranch(t, conf, "keepme")
    Seq((99L, "staged")).toDF("id", "s").write.format("cole")
      .mode("append").option("branch", "keepme").save(t)
    val sweep = spark.sql(
      "CALL orw.system.remove_orphan_files('db.orph2', 1, false)").collect()
    assert(sweep.isEmpty, s"nothing is orphaned here, got ${sweep.toSeq}")
    assert(fs.exists(bloomP), "live file's sidecar survives")
    assert(spark.read.format("cole").option("branch", "keepme")
      .load(t).count() === 11L)
    ColeRefs.dropBranch(t, conf, "keepme")

    // unversioned: every .col is live by definition; junk goes
    val u = s"$warehouse/db/orph3"
    mkJunkTable(u)
  }

  test("abandoned dotted scratch dirs sweep whole; live ones stay") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/orph4"
    (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("cole").mode("append").save(t)
    ColeVersions.enable(t, conf)
    val (fs, root) = ColeIO.resolve(t, conf)
    // an ABANDONED compaction/rebucket scratch: a dotted dir whose
    // contents all aged past the horizon — pure crash debris, invisible
    // to every reader, removable whole
    val dead = new HPath(root, ".compact-dead")
    fs.mkdirs(dead)
    plant(fs, new HPath(dead, "part-0.col"), "bytes", old = true)
    plant(fs, new HPath(dead, "part-1.col"), "bytes", old = true)
    fs.setTimes(dead, System.currentTimeMillis() - 10 * 3600_000L, -1)
    // a LIVE scratch: one fresh file keeps the whole tree (a running
    // maintenance job keeps landing files there)
    val liveDir = new HPath(root, ".compact-live")
    fs.mkdirs(liveDir)
    plant(fs, new HPath(liveDir, "part-old.col"), "bytes", old = true)
    plant(fs, new HPath(liveDir, "part-new.col"), "bytes", old = false)
    fs.setTimes(liveDir, System.currentTimeMillis() - 10 * 3600_000L, -1)
    val swept = ColeOrphans.removeOrphans(t, conf, 3600_000L, dryRun = false)
    assert(swept.map(_.path) === Seq(".compact-dead"))
    assert(swept.head.sizeBytes === 10L) // both files counted
    assert(!fs.exists(dead))
    assert(fs.exists(new HPath(liveDir, "part-old.col")),
      "a live scratch survives whole — even its old files")
    assert(spark.read.format("cole").load(t).count() === 10L)
    fs.delete(liveDir, true)
  }

  private def mkJunkTable(u: String): Unit = {
    val s = spark
    import s.implicits._
    (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("cole").mode("append").save(u)
    val (ufs, uroot) = ColeIO.resolve(u, conf)
    plant(ufs, new HPath(uroot, ".dead.tmp"), "junk", old = true)
    val useep = ColeOrphans.removeOrphans(u, conf, 3600_000L, dryRun = false)
    assert(useep.map(_.path) === Seq(".dead.tmp"))
    assert(spark.read.format("cole").load(u).count() === 10L)
  }
}
