package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Identity partition-spec evolution (r16, verdict ask #3):
  * `CALL cole.system.evolve_partition('db.t', 'region')` re-declares the
  * hive partition columns with ZERO rewrites. Old files keep the column
  * as DATA (it varies within them); new files serve it from `region=`
  * directories; every read surface resolves placement PER FILE. Pinned:
  *   - evolve is metadata-only: every pre-evolution file byte-identical;
  *   - appends route by the new spec (directory layout, column not
  *     stored in the new files);
  *   - reads and filters are exact across the mixed table, and a filter
  *     on the evolved column never OPENS a new-era file of another
  *     directory (per-era pruning);
  *   - time travel to a pre-evolution version resolves as-of (files
  *     self-describe — no spec lookup needed);
  *   - row-level DML spans both lanes and its replacement files ADOPT
  *     the active spec (rewritten rows migrate to the new layout);
  *   - the DROP direction mirrors all of it;
  *   - undeclared mixed hive layouts are still corruption (the
  *     consistency check relaxes only for declared evolution).
  */
class ColePartEvolveSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_pev_wh").toString

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.pev", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.pev.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def fileState(t: String): Map[String, (Long, Long)] =
    ColeIO.listPartitioned(t, conf).map { case (st, _) =>
      st.getPath.toString -> (st.getLen, st.getModificationTime)
    }.toMap

  test("evolve-ADD: zero rewrites, dual reads, per-era pruning, as-of, DML migration") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/ea"
    // era 0: UNPARTITIONED — region varies within each file
    (0 until 300).map(i => (i.toLong, s"r${i % 3}", i.toLong * 10))
      .toDF("id", "region", "v")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL pev.system.versioning('db.ea')")
    val vPre = ColeVersions.currentVersion(t, conf)
    val preBytes = fileState(t)
    val hist = spark.sql(
      "CALL pev.system.evolve_partition('db.ea', 'region')").collect()
    assert(hist.head.getString(0) === "[] -> [region]")
    // metadata-only: no data file moved or changed
    assert(fileState(t) === preBytes, "evolve_partition rewrote data files")
    // new writes route by the ACTIVE spec: directory layout, column not
    // stored in the file
    (300 until 360).map(i => (i.toLong, s"r${i % 3}", i.toLong * 10))
      .toDF("id", "region", "v")
      .repartition(1).write.format("cole").mode("append")
      .saveAsTable("pev.db.ea")
    val newFiles = fileState(t).keySet -- preBytes.keySet
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("region=")),
      s"appends did not adopt the evolved layout: $newFiles")
    newFiles.foreach { f =>
      val r = new ColeFileReader(f, conf)
      try assert(!r.meta.columns.exists(_.name == "region"),
        "a new-era file stored the partition column") finally r.close()
    }
    // reads are exact across the mixed table, both lanes serving region
    val df = spark.table("pev.db.ea")
    assert(df.count() === 360L)
    assert(df.agg(sum("v")).head().getLong(0) ===
      (0L until 360L).map(_ * 10).sum)
    assert(df.groupBy("region").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("r0" -> 120L, "r1" -> 120L, "r2" -> 120L))
    // filter on the evolved column: exact, and new-era files of OTHER
    // regions are never opened (directory pruning); old-era files must
    // open (the column varies inside them)
    val q = df.filter(col("region") === "r1")
    q.agg(sum("id")).head() // footer-cache warm
    ColeIO.opens.set(0)
    val got = q.select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (0 until 360).filter(_ % 3 == 1).map(_.toLong))
    val opened = ColeIO.opens.get()
    val oldCount = preBytes.size
    val newMatch = newFiles.count(_.contains("region=r1"))
    assert(opened <= oldCount + newMatch,
      s"region filter opened $opened files; old=$oldCount newMatch=$newMatch")
    // as-of: the pre-evolution snapshot reads the original 300 rows with
    // region intact (per-file self-description, no spec resolution)
    val old = spark.read.format("cole")
      .option("versionAsOf", vPre.toString).load(t)
    assert(old.count() === 300L)
    assert(old.filter(col("region") === "r2").count() === 100L)
    // row-level DML spans both lanes and ADOPTS the active spec
    spark.sql("UPDATE pev.db.ea SET v = -1 WHERE region = 'r0' AND id < 330")
    val after = spark.table("pev.db.ea")
    assert(after.filter(col("v") === -1).count() === 110L)
    assert(after.count() === 360L)
    val rewritten = fileState(t).keySet -- preBytes.keySet -- newFiles
    assert(rewritten.nonEmpty && rewritten.forall(_.contains("region=")),
      s"DML replacements did not adopt the active spec: $rewritten")
    // aggregate over the mixed table stays exact (pushdown declines the
    // dual shape rather than answering wrong)
    assert(after.groupBy("region").agg(count(lit(1))).collect()
      .map(_.getLong(1)).sum === 360L)
  }

  test("evolve-DROP: directory column becomes data, both lanes exact") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/ed"
    (0 until 200).map(i => (i.toLong, s"g${i % 2}", i.toLong))
      .toDF("id", "g", "v")
      .write.format("cole").partitionBy("g").mode("overwrite").save(t)
    spark.sql("CALL pev.system.versioning('db.ed')")
    val preBytes = fileState(t)
    spark.sql("CALL pev.system.evolve_partition('db.ed', '')")
    assert(fileState(t) === preBytes)
    // new writes are UNPARTITIONED and STORE g
    (200 until 240).map(i => (i.toLong, s"g${i % 2}", i.toLong))
      .toDF("id", "g", "v")
      .repartition(1).write.format("cole").mode("append")
      .saveAsTable("pev.db.ed")
    val newFiles = fileState(t).keySet -- preBytes.keySet
    assert(newFiles.nonEmpty && newFiles.forall(f => !f.contains("g=")),
      s"appends still partitioned after the drop: $newFiles")
    val df = spark.table("pev.db.ed")
    assert(df.count() === 240L)
    assert(df.filter(col("g") === "g1").count() === 120L)
    assert(df.filter(col("g") === "g1").agg(max("id")).head().getLong(0) === 239L)
    // old-era files of the other directory still prune whole (dir lane)
    df.filter(col("g") === "g0").agg(sum("v")).head()
    ColeIO.opens.set(0)
    assert(df.filter(col("g") === "g0").count() === 120L)
    assert(ColeIO.opens.get() <=
      preBytes.keys.count(_.contains("g=g0")) + newFiles.size,
      "dropped-column filter stopped dir-pruning old-era files")
    // DML across both lanes
    spark.sql("DELETE FROM pev.db.ed WHERE g = 'g0'")
    assert(spark.table("pev.db.ed").count() === 120L)
    assert(spark.table("pev.db.ed").filter(col("g") === "g0").count() === 0L)
  }

  test("composes with a temporal layout: identity dirs nest beside unit ordinals") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/et"
    // era 0: temporal-only (days ordinals); region is data
    (0 until 96).map(i => (i.toLong, s"r${i % 2}",
      java.sql.Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")))
      .toDF("id", "region", "ts")
      .write.format("cole").option("partitionByTemporal", "days:ts")
      .mode("overwrite").save(t)
    spark.sql("CALL pev.system.versioning('db.et')")
    val preBytes = fileState(t)
    spark.sql("CALL pev.system.evolve_partition('db.et', 'region')")
    assert(fileState(t) === preBytes)
    // era 1: identity dirs compose with the SAME temporal layout
    (96 until 144).map(i => (i.toLong, s"r${i % 2}",
      java.sql.Timestamp.valueOf(f"2024-01-${1 + i / 24}%02d ${i % 24}%02d:00:00")))
      .toDF("id", "region", "ts")
      .repartition(1).write.format("cole").mode("append")
      .saveAsTable("pev.db.et")
    val newFiles = fileState(t).keySet -- preBytes.keySet
    assert(newFiles.nonEmpty &&
      newFiles.forall(f => f.contains("region=") && f.contains("_t_days_ts=")),
      s"appends lost a layout half: $newFiles")
    val df = spark.table("pev.db.et")
    assert(df.count() === 144L)
    // dual filter + temporal filter together, both lanes
    assert(df.filter(col("region") === "r1" &&
      col("ts") >= java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
      .count() === (96 until 144).count(i => i % 2 == 1).toLong)
    assert(df.filter(col("region") === "r0").count() === 72L)
  }

  test("vector-mode DELETE applies duality lanes per file") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/evv"
    (0 until 120).map(i => (i.toLong, s"g${i % 2}", i.toLong))
      .toDF("id", "g", "v")
      .write.format("cole").partitionBy("g").mode("overwrite").save(t)
    spark.sql("CALL pev.system.versioning('db.evv')")
    spark.sql("CALL pev.system.evolve_partition('db.evv', '')") // DROP
    (120 until 160).map(i => (i.toLong, s"g${i % 2}", i.toLong))
      .toDF("id", "g", "v")
      .repartition(1).write.format("cole").mode("append")
      .saveAsTable("pev.db.evv")
    spark.sql("CALL pev.system.delete_mode('db.evv', 'vector')")
    val bytesBefore = fileState(t)
    // g is DIRECTORY-served in old files (whole-file dir decision:
    // every row matches → full vector) and DATA in the new file
    // (row-exact selection)
    spark.sql("DELETE FROM pev.db.evv WHERE g = 'g0' AND id < 130")
    assert(fileState(t) === bytesBefore, "vector DELETE rewrote data files")
    val df = spark.table("pev.db.evv")
    assert(df.count() === 160L - 65L)
    assert(df.filter(col("g") === "g0").count() === 15L)
    assert(df.filter(col("g") === "g0").agg(min("id")).head().getLong(0) === 130L)
  }

  test("a clone of a mixed-era source stays readable and writes by the active spec") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/ec"
    (0 until 100).map(i => (i.toLong, s"r${i % 2}", i.toLong))
      .toDF("id", "region", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL pev.system.versioning('db.ec')")
    spark.sql("CALL pev.system.evolve_partition('db.ec', 'region')")
    (100 until 140).map(i => (i.toLong, s"r${i % 2}", i.toLong))
      .toDF("id", "region", "v")
      .repartition(1).write.format("cole").mode("append")
      .saveAsTable("pev.db.ec")
    spark.sql("CALL pev.system.clone('db.ec', 'db.ecc')")
    // the clone resolves the mixed layout (the _partspec exemption
    // traveled) and serves both lanes
    val c = spark.table("pev.db.ecc")
    assert(c.count() === 140L)
    assert(c.filter(col("region") === "r1").count() === 70L)
    // clone-local appends follow the ACTIVE spec
    (140 until 150).map(i => (i.toLong, s"r${i % 2}", i.toLong))
      .toDF("id", "region", "v")
      .repartition(1).write.format("cole").mode("append")
      .saveAsTable("pev.db.ecc")
    val cdir = s"$warehouse/db/ecc"
    val local = ColeIO.listPartitioned(cdir, conf).map(_._1.getPath.toString)
    assert(local.nonEmpty && local.forall(_.contains("region=")),
      s"clone append ignored the active spec: $local")
    assert(spark.table("pev.db.ecc").count() === 150L)
    assert(spark.table("pev.db.ec").count() === 140L, "clone write leaked")
  }

  test("WAP branch DML over a mixed-era table: both lanes staged, published exactly") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/eb"
    (0 until 100).map(i => (i.toLong, s"r${i % 2}", i.toLong))
      .toDF("id", "region", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL pev.system.versioning('db.eb')")
    spark.sql("CALL pev.system.evolve_partition('db.eb', 'region')")
    (100 until 140).map(i => (i.toLong, s"r${i % 2}", i.toLong))
      .toDF("id", "region", "v")
      .repartition(1).write.format("cole").mode("append")
      .saveAsTable("pev.db.eb")
    spark.sql("CALL pev.system.create_branch('db.eb', 'fix')")
    val mainBefore = fileState(t)
    spark.conf.set(ColeRefs.WapBranchConfKey, "fix")
    try {
      // hits BOTH lanes: r1 rows live as data in the old file and under
      // region=r1 in the new one
      spark.sql("UPDATE pev.db.eb SET v = -5 WHERE region = 'r1' AND id < 120")
      val br = spark.read.format("cole").option("branch", "fix").load(t)
      assert(br.filter(col("v") === -5).count() === 60L)
    } finally spark.conf.unset(ColeRefs.WapBranchConfKey)
    assert(fileState(t) === mainBefore, "branch DML touched main")
    assert(spark.table("pev.db.eb").filter(col("v") === -5).count() === 0L)
    spark.sql("CALL pev.system.fast_forward('db.eb', 'fix')")
    val main = spark.table("pev.db.eb")
    assert(main.count() === 140L)
    assert(main.filter(col("v") === -5).count() === 60L)
    assert(main.filter(col("region") === "r1").count() === 70L)
  }

  test("validation: unknown column, bad type, re-declare, undeclared mix stays loud") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/ev"
    (0 until 10).map(i => (i.toLong, i.toDouble)).toDF("id", "d")
      .write.format("cole").mode("overwrite").save(t)
    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    fails("CALL pev.system.evolve_partition('db.ev', 'nope')",
      "not a column")
    fails("CALL pev.system.evolve_partition('db.ev', 'd')",
      "must be INT/LONG/STRING")
    spark.sql("CALL pev.system.evolve_partition('db.ev', 'id')")
    fails("CALL pev.system.evolve_partition('db.ev', 'id')",
      "already partitions by")
    // an UNDECLARED mixed hive layout is still corruption: hand-plant a
    // key=value file beside flat ones on a never-evolved table
    val t2 = s"$warehouse/db/ev2"
    (0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t2)
    val (fs, _) = ColeIO.resolve(t2, conf)
    val src = ColeIO.listPartitioned(t2, conf).head._1.getPath
    val dst = new org.apache.hadoop.fs.Path(s"$t2/id=1/planted.col")
    fs.mkdirs(dst.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, true, conf)
    val e = intercept[Exception](
      spark.read.format("cole").load(t2).count())
    assert(e.getMessage.contains("inconsistent partition directory"),
      s"got: ${e.getMessage}")
  }
}
