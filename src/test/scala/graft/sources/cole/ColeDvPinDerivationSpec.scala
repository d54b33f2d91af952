package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins under `_cole_versions/dv/` are written from the ORDINAL SETS the
  * committing tasks computed — never by copying the live sidecar, whose
  * content is mutable (another writer can extend it). The commit's pin
  * is therefore exactly the commit's view: mutating the live sidecar
  * after (or concurrently with) the commit changes LIVE reads only;
  * time travel and the change feed keep resolving the commit's own
  * delta. Covers both vector-DML serve paths: the DELETE fast path
  * (executor-written pins) and the delta UPDATE/MERGE commit
  * (driver-written pins from the merged sets).
  */
class ColeDvPinDerivationSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_pin_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.pin", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.pin.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** Extend the vectored data file's live sidecar with foreign
    * ordinals, as a racing writer would (the vectored file is the one
    * the version log's dv entry names).
    */
  private def extendLiveSidecar(t: String, foreign: Array[Int]): Unit = {
    val (fs, _) = ColeIO.resolve(t, conf)
    val rel = ColeVersions.dvAsOf(t, conf,
      ColeVersions.currentVersion(t, conf)).keys.head
    val phys = fs.makeQualified(
      new org.apache.hadoop.fs.Path(t, rel)).toString
    val info = ColeMetaCache.infos(t, conf).find(_.path == phys).get
    val existing = ColeDv.read(fs, info.path, info.len, info.mtime)
      .getOrElse(Array.empty[Int])
    ColeDv.write(fs, info.path, info.len, info.mtime,
      ColeDv.merge(existing, foreign))
  }

  test("vector DELETE pin is the commit's own ordinal set, immune to live-sidecar extension") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/del"
    (0 until 1000).map(i => (i.toLong, (i % 3).toLong)).toDF("k", "g")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    s.sql("CALL pin.system.versioning('db.del')")
    s.sql("CALL pin.system.delete_mode('db.del', 'vector')")
    s.sql("DELETE FROM pin.db.del WHERE k >= 100 AND k < 150") // v2

    // the pinned vector equals the deleted rows exactly (k == ordinal)
    val (fs, _) = ColeIO.resolve(t, conf)
    val dvRel = ColeVersions.dvAsOf(t, conf, 2L).values.head
    val pinned0 = ColeDv.parsePinned(fs, ColeVersions.dvPath(t, dvRel))._3
    assert(pinned0.toSeq === (100 until 150))

    // a racing writer extends the LIVE sidecar — the pin must not move
    extendLiveSidecar(t, Array(700, 701, 702))
    val pinned1 = ColeDv.parsePinned(fs, ColeVersions.dvPath(t, dvRel))._3
    assert(pinned1.toSeq === (100 until 150),
      "commit pin absorbed a foreign writer's live-sidecar ordinals")
    // the feed attributes ONLY the commit's rows to v2
    val fed = ColeChangeFeed.read(s, t, 1L, 2L).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(fed === (100L until 150L))
    // live reads DO see the foreign extension (it is live state)
    assert(s.read.format("cole").load(t).count() === 1000L - 50L - 3L)
  }

  test("MOR MERGE pin (delta write) is the commit's merged set, immune to live-sidecar extension") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/mrg"
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    s.sql("CALL pin.system.versioning('db.mrg')")
    s.sql("CALL pin.system.delete_mode('db.mrg', 'vector')")
    (200 until 260).map(i => (i.toLong, -1L)).toDF("id", "nv")
      .createOrReplaceTempView("pin_mrg_src")
    s.sql("""MERGE INTO pin.db.mrg t USING pin_mrg_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.nv""") // v2: 60 old images vector away

    val (fs, _) = ColeIO.resolve(t, conf)
    val dvRel = ColeVersions.dvAsOf(t, conf, 2L).values.head
    assert(ColeDv.parsePinned(fs,
      ColeVersions.dvPath(t, dvRel))._3.toSeq === (200 until 260))
    extendLiveSidecar(t, Array(900, 901))
    assert(ColeDv.parsePinned(fs,
      ColeVersions.dvPath(t, dvRel))._3.toSeq === (200 until 260),
      "delta-write pin absorbed foreign ordinals")
    val dels = ColeChangeFeed.read(s, t, 1L, 2L)
      .filter(col("_change_type") === "delete").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(dels === (200L until 260L))
  }

  test("time-travel scan stats report the version's PINNED live rows, not the live sidecar's") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/st"
    (0 until 1000).map(i => (i.toLong, 0L)).toDF("k", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    s.sql("CALL pin.system.versioning('db.st')")
    s.sql("CALL pin.system.delete_mode('db.st', 'vector')")
    s.sql("DELETE FROM pin.db.st WHERE k < 50")              // v2: -50
    s.sql("DELETE FROM pin.db.st WHERE k >= 900")            // v3: -100
    def rowsOf(v: Long): BigInt =
      s.read.format("cole").option("versionAsOf", v.toString).load(t)
        .queryExecution.optimizedPlan.stats.rowCount.get
    // v2's estimate must subtract ONLY v2's pinned vector (50 rows) —
    // the live sidecar additionally carries v3's 100 and would
    // under-report the snapshot to AQE/CBO
    assert(rowsOf(1L) === BigInt(1000))
    assert(rowsOf(2L) === BigInt(950))
    assert(rowsOf(3L) === BigInt(850))
    assert(s.read.format("cole").load(t)
      .queryExecution.optimizedPlan.stats.rowCount.get === BigInt(850))
  }
}
