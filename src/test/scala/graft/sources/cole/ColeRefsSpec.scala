package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named refs (r14): TAGS (immutable named versions) and BRANCHES
  * (write-audit-publish forks). Pinned here:
  *   - tag create/resolve through the read option, SQL `VERSION AS OF`,
  *     and `$refs`; immutability; numeric names rejected; drop;
  *   - a tag PINS retention — `expire_versions` cannot expire the
  *     removals that reconstruct it; dropping the tag releases them;
  *   - branch staging is INVISIBLE to main (no live-dir files, main
  *     counts unchanged) while branch reads serve fork + staged;
  *   - publish (fast_forward) renames the staged files live under ONE
  *     commit and consumes the branch; diverged main rejects unless
  *     allow_diverged; a CHECK constraint declared AFTER staging still
  *     gates publication (and a failed publish leaves the branch usable);
  *   - the WAP session conf routes plain appends to the branch;
  *   - truncate/overwrite on a branch reject loudly;
  *   - concurrent branch appends all land (claim-serialized CAS).
  */
class ColeRefsSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_refs_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.refw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.refw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def writeRows(t: String, from: Int, n: Int,
      branch: Option[String] = None): Unit = {
    val s = spark
    import s.implicits._
    val w = (from until from + n).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("cole").mode("append")
    branch.fold(w)(b => w.option("branch", b)).save(t)
  }

  test("tags: create, resolve (option + SQL + $refs), immutable, drop") {
    val t = s"$warehouse/db/tags"
    writeRows(t, 0, 10)
    ColeVersions.enable(t, conf) // v1 = 10 rows
    writeRows(t, 10, 10) // v2 = 20 rows
    val tagged = spark.sql(
      s"CALL refw.system.create_tag('db.tags', 'base', 1)").collect()
    assert(tagged.head.getLong(0) === 1L)
    // read option resolves the tag name
    assert(spark.read.format("cole").option("versionAsOf", "base")
      .load(t).count() === 10L)
    // SQL VERSION AS OF resolves it through the catalog
    assert(spark.sql(
      "SELECT count(*) FROM refw.db.tags VERSION AS OF 'base'")
      .head().getLong(0) === 10L)
    assert(spark.read.format("cole").load(t).count() === 20L)
    // default version = current
    spark.sql("CALL refw.system.create_tag('db.tags', 'head')")
    assert(ColeRefs.tags(t, conf) === Map("base" -> 1L, "head" -> 2L))
    // $refs surfaces both
    val refs = spark.sql(s"SELECT * FROM refw.db.`tags$$refs` ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.toSeq === Seq(("base", "tag", 1L), ("head", "tag", 2L)))
    // immutable: re-tagging an existing name rejects
    val dup = intercept[Exception] {
      spark.sql("CALL refw.system.create_tag('db.tags', 'base', 2)")
    }
    assert(dup.getMessage.contains("already exists"))
    // numeric names would shadow VERSION AS OF numbers
    val num = intercept[Exception] {
      spark.sql("CALL refw.system.create_tag('db.tags', '123')")
    }
    assert(num.getMessage.contains("numeric"))
    // unknown refs are loud and name what exists
    val unk = intercept[Exception] {
      spark.read.format("cole").option("versionAsOf", "nope").load(t).count()
    }
    assert(unk.getMessage.contains("no tag or branch named 'nope'") &&
      unk.getMessage.contains("tag base"))
    // drop releases the name
    assert(spark.sql("CALL refw.system.drop_tag('db.tags', 'base')")
      .head().getBoolean(0))
    intercept[Exception] {
      spark.read.format("cole").option("versionAsOf", "base").load(t).count()
    }
  }

  test("a tag pins retention; dropping it releases the pin") {
    val t = s"$warehouse/db/tagpin"
    writeRows(t, 0, 10)
    ColeVersions.enable(t, conf) // v1
    // v2 rewrites everything: v1's bytes survive only as retired files
    val s = spark
    import s.implicits._
    (100 until 110).map(i => (i.toLong, s"r$i")).toDF("id", "s")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    ColeRefs.createTag(t, conf, "keep", Some(1L))
    // TTL 0: everything is old enough — but the tag caps expiry at v1,
    // so v2 (whose removes back v1's snapshot) must survive
    ColeVersions.vacuumRetired(t, conf, olderThanMs = 0)
    assert(spark.read.format("cole").option("versionAsOf", "keep")
      .load(t).agg(sum("id")).head().getLong(0) === (0L until 10L).sum)
    // drop the tag: the same vacuum now expires v2's retired bytes
    ColeRefs.dropTag(t, conf, "keep")
    assert(ColeVersions.vacuumRetired(t, conf, olderThanMs = 0) > 0)
    val gone = intercept[Exception] {
      spark.read.format("cole").option("versionAsOf", "1").load(t).count()
    }
    assert(gone.getMessage.contains("no longer readable") ||
      gone.getMessage.contains("not reconstructible"))
  }

  test("branch WAP: invisible staging, isolated reads, publish under one commit") {
    val t = s"$warehouse/db/wap"
    writeRows(t, 0, 10)
    ColeVersions.enable(t, conf) // v1
    assert(spark.sql("CALL refw.system.create_branch('db.wap', 'audit')")
      .head().getLong(0) === 1L)
    val liveBefore = ColeIO.listPartitioned(t, conf).size
    writeRows(t, 10, 10, branch = Some("audit"))
    writeRows(t, 20, 10, branch = Some("audit"))
    // main: untouched — same live files, same rows, same version
    assert(ColeIO.listPartitioned(t, conf).size === liveBefore)
    assert(spark.read.format("cole").load(t).count() === 10L)
    assert(ColeVersions.currentVersion(t, conf) === 1L)
    // branch reads serve fork + staged, via the option and via SQL
    assert(spark.read.format("cole").option("branch", "audit")
      .load(t).count() === 30L)
    assert(spark.sql(
      "SELECT sum(id) FROM refw.db.wap VERSION AS OF 'audit'")
      .head().getLong(0) === (0L until 30L).sum)
    // $refs: fork 1, two staged commits -> head 3
    val row = spark.sql(s"SELECT * FROM refw.db.`wap$$refs`").collect()
    assert(row.length === 1)
    assert((row.head.getString(0), row.head.getString(1), row.head.getLong(2),
      row.head.getLong(3)) === ("audit", "branch", 1L, 3L))
    assert(row.head.getInt(4) >= 2) // at least one file per staged commit
    // publish: one rename per staged file + ONE commit
    val ff = spark.sql("CALL refw.system.fast_forward('db.wap', 'audit')")
      .collect()
    assert(ff.head.getLong(0) >= 2L)
    assert(ff.head.getLong(1) === 2L)
    assert(spark.read.format("cole").load(t).agg(sum("id")).head().getLong(0)
      === (0L until 30L).sum)
    val hist = spark.sql(
      s"SELECT operation FROM refw.db.`wap$$history` WHERE version = 2")
      .head().getString(0)
    assert(hist === "publish-audit")
    // consumed: no refs left, branch reads loud, staging dir gone
    assert(spark.sql(s"SELECT * FROM refw.db.`wap$$refs`").collect().isEmpty)
    intercept[Exception] {
      spark.read.format("cole").option("branch", "audit").load(t).count()
    }
    val (fs, _) = ColeIO.resolve(t, conf)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      ColeRefs.branchDataRoot(t, "audit"))))
  }

  test("branch writes are append-only; unknown branches and branch-as-versionAsOf are loud") {
    val t = s"$warehouse/db/guard"
    writeRows(t, 0, 5)
    ColeVersions.enable(t, conf)
    ColeRefs.createBranch(t, conf, "b1")
    val s = spark
    import s.implicits._
    val ow = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "s").write.format("cole")
        .mode("overwrite").option("branch", "b1").save(t)
    }
    assert(ow.getMessage.contains("append-only"))
    val missing = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "s").write.format("cole")
        .mode("append").option("branch", "nope").save(t)
    }
    assert(missing.getMessage.contains("branch 'nope' does not exist"))
    // a branch name under versionAsOf points the user at the right door
    val wrongDoor = intercept[Exception] {
      spark.read.format("cole").option("versionAsOf", "b1").load(t).count()
    }
    assert(wrongDoor.getMessage.contains("is a BRANCH"))
    ColeRefs.dropBranch(t, conf, "b1")
  }

  test("the WAP session conf routes plain appends to the branch") {
    val t = s"$warehouse/db/wapconf"
    writeRows(t, 0, 5)
    ColeVersions.enable(t, conf)
    ColeRefs.createBranch(t, conf, "staging")
    spark.conf.set(ColeRefs.WapBranchConfKey, "staging")
    try writeRows(t, 5, 5) // NO branch option — the conf routes it
    finally spark.conf.unset(ColeRefs.WapBranchConfKey)
    assert(spark.read.format("cole").load(t).count() === 5L)
    assert(spark.read.format("cole").option("branch", "staging")
      .load(t).count() === 10L)
    ColeRefs.fastForward(t, conf, "staging")
    assert(spark.read.format("cole").load(t).count() === 10L)
  }

  test("diverged main rejects publish; allow_diverged composes appends") {
    val t = s"$warehouse/db/diverge"
    writeRows(t, 0, 5)
    ColeVersions.enable(t, conf) // v1
    ColeRefs.createBranch(t, conf, "b")
    writeRows(t, 5, 5, branch = Some("b"))
    writeRows(t, 10, 5) // main advances: v2
    val no = intercept[Exception] {
      spark.sql("CALL refw.system.fast_forward('db.diverge', 'b')").collect()
    }
    assert(no.getMessage.contains("advanced past the fork"))
    // the failed publish left the branch intact
    assert(spark.read.format("cole").option("branch", "b").load(t).count() === 10L)
    val ok = spark.sql(
      "CALL refw.system.fast_forward('db.diverge', 'b', true)").collect()
    assert(ok.head.getLong(1) === 3L)
    assert(spark.read.format("cole").load(t).agg(sum("id")).head().getLong(0)
      === (0L until 15L).sum)
  }

  test("a CHECK constraint declared AFTER staging still gates publication") {
    val t = s"$warehouse/db/gate"
    writeRows(t, 0, 5)
    ColeVersions.enable(t, conf)
    ColeRefs.createBranch(t, conf, "bad")
    val s = spark
    import s.implicits._
    Seq((-1L, "neg")).toDF("id", "s").write.format("cole")
      .mode("append").option("branch", "bad").save(t)
    // declared after the branch write: the populated-table scan cannot
    // see invisible staged files — publish must still enforce it
    ColeChecks.write(t, conf, Seq(("pos_id", "id >= 0")))
    val rejected = intercept[Exception] {
      ColeRefs.fastForward(t, conf, "bad")
    }
    assert(rejected.getMessage.contains("pos_id"))
    // the branch survives the failed publish, main is untouched
    assert(spark.read.format("cole").option("branch", "bad").load(t).count() === 6L)
    assert(spark.read.format("cole").load(t).count() === 5L)
    ColeChecks.write(t, conf, Seq.empty)
    ColeRefs.fastForward(t, conf, "bad")
    assert(spark.read.format("cole").load(t).count() === 6L)
  }

  test("a crashed publish resumes: remaining renames, exactly-one commit") {
    val t = s"$warehouse/db/resume"
    writeRows(t, 0, 5)
    ColeVersions.enable(t, conf) // v1
    ColeRefs.createBranch(t, conf, "crash")
    writeRows(t, 5, 5, branch = Some("crash"))
    writeRows(t, 10, 5, branch = Some("crash")) // two staged files
    val (fs, _) = ColeIO.resolve(t, conf)
    import org.apache.hadoop.fs.Path
    val root = new Path(ColeRefs.branchDataRoot(t, "crash"))
    // simulate the crash window: ref already retired to the marker, ONE
    // staged file already renamed live, nothing committed
    val refDir = new Path(s"$t/${ColeVersions.DirName}/_refs/branch")
    assert(fs.rename(new Path(refDir, "crash"),
      new Path(refDir, ".crash.publishing")))
    val staged = fs.listStatus(root).filter(_.isFile)
    assert(staged.length === 2)
    assert(fs.rename(staged.head.getPath,
      new Path(t, staged.head.getPath.getName)))
    // the half-published state: the moved file is live-listable (the
    // same visibility a plain append has between its rename and its
    // record), the marker still pins the fork for retention, and the
    // dotted marker never shows up as a ref
    assert(spark.read.format("cole").load(t).count() === 10L)
    assert(ColeRefs.pinVersions(t, conf) === Seq(1L))
    assert(ColeRefs.branches(t, conf).isEmpty)
    // resume: remaining rename + ONE publish commit + cleanup
    val (n, v) = ColeRefs.fastForward(t, conf, "crash")
    assert(n === 2)
    assert(spark.read.format("cole").load(t).count() === 15L)
    assert(ColeVersions.currentVersion(t, conf) === v)
    assert(!fs.exists(new Path(refDir, ".crash.publishing")))
    assert(!fs.exists(root))
    assert(ColeVersions.records(t, conf).count(_.op == "publish-crash") === 1)
  }

  test("branch handles reject row-level DML and truncate loudly") {
    val t = s"$warehouse/db/dmlguard"
    writeRows(t, 0, 5)
    ColeVersions.enable(t, conf)
    ColeRefs.createBranch(t, conf, "b")
    // the DML/truncate paths resolve the LIVE table and never see the
    // branch prop — a branch-pinned handle must reject them, not
    // silently mutate main
    val schema = spark.read.format("cole").load(t).schema
    val tbl = new ColeTable(schema, Seq.empty, Map("path" -> t, "branch" -> "b"))
    assert(intercept[UnsupportedOperationException](tbl.truncateTable())
      .getMessage.contains("append-only"))
    assert(intercept[UnsupportedOperationException] {
      tbl.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("id", 1L)))
    }.getMessage.contains("append-only"))
    import org.apache.spark.sql.connector.write.{RowLevelOperation, RowLevelOperationInfo}
    val info = new RowLevelOperationInfo {
      override def command(): RowLevelOperation.Command =
        RowLevelOperation.Command.UPDATE
      override def options() = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap())
    }
    assert(intercept[UnsupportedOperationException] {
      tbl.newRowLevelOperationBuilder(info).build()
    }.getMessage.contains("append-only"))
    // main untouched by the rejected attempts
    assert(spark.read.format("cole").load(t).count() === 5L)
    ColeRefs.dropBranch(t, conf, "b")
  }

  test("the WAP conf leaves unversioned tables and maintenance scratch alone") {
    val t = s"$warehouse/db/wapscratch"
    writeRows(t, 0, 8)
    writeRows(t, 8, 8) // two files, so compact has work
    ColeVersions.enable(t, conf)
    ColeRefs.createBranch(t, conf, "w")
    val plain = s"$warehouse/db/wapplain"
    spark.conf.set(ColeRefs.WapBranchConfKey, "w")
    try {
      // unversioned target: the switch does NOT apply (branches only
      // exist on versioned tables) — the write lands in the table
      writeRows(plain, 0, 3)
      assert(spark.read.format("cole").load(plain).count() === 3L)
      // maintenance on a versioned table runs its (unversioned) scratch
      // rewrite while the switch is set — the r14 regression this pins.
      // The branch CARRIES rows first (r15): compaction reads MAIN
      // through the WAP-bypass option, so it must never fold unaudited
      // staged rows into the rewritten files
      writeRows(t, 900, 5, branch = Some("w"))
      ColeCompact.compact(spark, t, targetBytes = 1L << 30)
      val vPin = ColeVersions.currentVersion(t, conf)
      assert(spark.read.format("cole")
        .option("versionAsOf", vPin.toString).load(t).count() === 16L,
        "compaction under the WAP conf folded branch rows into main")
      // the switch still routes the versioned table's appends — and
      // (r15, Iceberg wap.branch read semantics) plain READS of the
      // branched table now follow the branch too, so the audit job sees
      // its own staged rows through the table's normal name; an explicit
      // version pin still reads main's history
      writeRows(t, 16, 4) // routed to the branch: 16 main + 5 + 4 staged
      assert(spark.read.format("cole").load(t).count() === 25L)
      assert(spark.read.format("cole").option("branch", "w").load(t)
        .count() === 25L)
      val vMain = ColeVersions.currentVersion(t, conf)
      assert(spark.read.format("cole")
        .option("versionAsOf", vMain.toString).load(t).count() === 16L)
    } finally spark.conf.unset(ColeRefs.WapBranchConfKey)
    // outside the switch, the table reads main again
    assert(spark.read.format("cole").load(t).count() === 16L)
    ColeRefs.dropBranch(t, conf, "w")
  }

  test("concurrent branch appends all land (claim-serialized record CAS)") {
    val t = s"$warehouse/db/conc"
    writeRows(t, 0, 4)
    ColeVersions.enable(t, conf)
    ColeRefs.createBranch(t, conf, "par")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (0 until 4).map { k =>
        pool.submit(new Runnable {
          override def run(): Unit = writeRows(t, 100 + k * 10, 10,
            branch = Some("par"))
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdown()
    val b = ColeRefs.branches(t, conf).find(_.name == "par").get
    assert(b.head === b.fork + 4, s"expected 4 branch commits, got $b")
    assert(spark.read.format("cole").option("branch", "par")
      .load(t).count() === 44L)
    ColeRefs.fastForward(t, conf, "par")
    assert(spark.read.format("cole").load(t).count() === 44L)
  }
}
