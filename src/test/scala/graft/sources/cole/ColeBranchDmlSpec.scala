package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch row-level DML (r15, verdict ask #3): with the WAP session conf
  * set, UPDATE/MERGE/DELETE read the BRANCH state and commit to the
  * branch — mask-don't-retire against main-as-of-fork (the clone-DML
  * pattern's third application). Pinned here:
  *   - a branch UPDATE/DELETE is INVISIBLE on main (files byte-identical,
  *     counts unchanged) while branch reads serve the DML'd state;
  *   - publish retires the masked fork files in the fast_forward commit
  *     atomically: main then reads exactly the audited state, and time
  *     travel to the pre-publish version still serves the original rows;
  *   - a DML over a branch-STAGED file retires it branch-locally (no
  *     mask — the branch owns those bytes);
  *   - a DML branch rejects a diverged-main publish even with
  *     allow_diverged (retiring masked files is only sound against the
  *     audited state);
  *   - DELETE on a branch routes the row-level path (the metadata fast
  *     path would drop MAIN files); TRUNCATE under the WAP conf is loud;
  *   - dropping the branch discards the DML — main never changes;
  *   - vector-mode tables reject branch DML loudly.
  */
class ColeBranchDmlSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_bdml_wh").toString

  private lazy val spark: SparkSession = {
    // force a session WITH GraftExtensions even when an earlier suite
    // created the shared one without them — the concurrent-DML case
    // needs the ColeDmlRetry strategy (the ColeDmlRetrySpec pattern)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.bdml", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.bdml.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def mkTable(name: String, n: Int = 100): String = {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/$name"
    (0 until n).map(i => (i.toLong, i % 5, s"r$i")).toDF("id", "g", "s")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    spark.sql(s"CALL bdml.system.versioning('db.$name')")
    t
  }

  private def onBranch[A](name: String)(f: => A): A = {
    spark.conf.set(ColeRefs.WapBranchConfKey, name)
    try f finally spark.conf.unset(ColeRefs.WapBranchConfKey)
  }

  private def fileState(t: String): Map[String, (Long, Long)] =
    ColeIO.listPartitioned(t, conf).map { case (st, _) =>
      st.getPath.toString -> (st.getLen, st.getModificationTime)
    }.toMap

  test("branch UPDATE and DELETE: invisible on main, visible on the branch, atomic publish") {
    val t = mkTable("upd")
    spark.sql("CALL bdml.system.create_branch('db.upd', 'audit')")
    val mainBefore = fileState(t)
    onBranch("audit") {
      spark.sql("UPDATE bdml.db.upd SET s = 'X' WHERE id < 10")
      spark.sql("DELETE FROM bdml.db.upd WHERE id >= 90")
    }
    // main: byte-identical files, original rows
    assert(fileState(t) === mainBefore, "branch DML touched main's files")
    val main = spark.table("bdml.db.upd")
    assert(main.count() === 100L)
    assert(main.filter(col("s") === "X").count() === 0L)
    // branch read serves the DML'd state
    val br = spark.read.format("cole").option("branch", "audit").load(t)
    assert(br.count() === 90L)
    assert(br.filter(col("s") === "X").count() === 10L)
    assert(br.agg(max("id")).head().getLong(0) === 89L)
    // masks recorded, visible in $refs staged accounting too
    assert(ColeRefs.branchMasks(t, conf, "audit").nonEmpty)
    // publish: main flips to the audited state in ONE commit
    val vBefore = ColeVersions.currentVersion(t, conf)
    spark.sql("CALL bdml.system.fast_forward('db.upd', 'audit')")
    val after = spark.table("bdml.db.upd")
    assert(after.count() === 90L)
    assert(after.filter(col("s") === "X").count() === 10L)
    assert(ColeVersions.currentVersion(t, conf) === vBefore + 1)
    // time travel to the pre-publish version still serves the originals
    val old = spark.read.format("cole")
      .option("versionAsOf", vBefore.toString).load(t)
    assert(old.count() === 100L &&
      old.filter(col("s") === "X").count() === 0L)
  }

  test("DML over branch-staged files retires branch-locally; re-run rewrites nothing") {
    val s = spark
    import s.implicits._
    val t = mkTable("staged")
    spark.sql("CALL bdml.system.create_branch('db.staged', 'b')")
    // stage an append, then UPDATE rows that live ONLY in the staged file
    (100 until 120).map(i => (i.toLong, i % 5, s"r$i")).toDF("id", "g", "s")
      .coalesce(1).write.format("cole").option("branch", "b")
      .mode("append").save(t)
    onBranch("b") {
      spark.sql("UPDATE bdml.db.staged SET s = 'Y' WHERE id >= 110")
      // no mask: the replaced file was branch-owned
      assert(ColeRefs.branchMasks(t, conf, "b").isEmpty,
        "updating a staged file must not mask fork files")
      val br = spark.read.format("cole").option("branch", "b").load(t)
      assert(br.filter(col("s") === "Y").count() === 10L)
      assert(br.count() === 120L)
      // no-op re-run: the same UPDATE changes nothing and rewrites nothing
      val stBefore = ColeRefs.branches(t, conf).find(_.name == "b").get
      spark.sql("UPDATE bdml.db.staged SET s = 'Y' WHERE id >= 110")
      val stAfter = ColeRefs.branches(t, conf).find(_.name == "b").get
      assert(stAfter.stagedFiles === stBefore.stagedFiles,
        "a no-op branch UPDATE fragmented the staging area")
      assert(spark.read.format("cole").option("branch", "b").load(t)
        .filter(col("s") === "Y").count() === 10L)
    }
    spark.sql("CALL bdml.system.fast_forward('db.staged', 'b')")
    val main = spark.table("bdml.db.staged")
    assert(main.count() === 120L &&
      main.filter(col("s") === "Y").count() === 10L)
  }

  test("a DML branch rejects diverged-main publish even with allow_diverged") {
    val s = spark
    import s.implicits._
    val t = mkTable("div")
    spark.sql("CALL bdml.system.create_branch('db.div', 'b')")
    onBranch("b")(spark.sql("DELETE FROM bdml.db.div WHERE id < 5"))
    // main advances past the fork
    Seq((1000L, 0, "new")).toDF("id", "g", "s")
      .write.format("cole").mode("append").save(t)
    val e = intercept[Exception] {
      spark.sql(
        "CALL bdml.system.fast_forward('db.div', 'b', allow_diverged => true)")
    }
    def msgs(x: Throwable): Seq[String] = Option(x).toSeq.flatMap(y =>
      Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("masked files")),
      s"expected the DML-branch divergence rejection, got: ${e.getMessage}")
    // the branch is still usable and droppable; main keeps everything
    spark.sql("CALL bdml.system.drop_branch('db.div', 'b')")
    assert(spark.table("bdml.db.div").count() === 101L)
  }

  test("drop discards branch DML; truncate under WAP is loud; vector mode rejects") {
    val t = mkTable("guards")
    spark.sql("CALL bdml.system.create_branch('db.guards', 'b')")
    onBranch("b") {
      spark.sql("DELETE FROM bdml.db.guards WHERE id < 50")
      assert(spark.read.format("cole").option("branch", "b").load(t)
        .count() === 50L)
      val e = intercept[Exception](
        spark.sql("TRUNCATE TABLE bdml.db.guards"))
      assert(e.getMessage != null && e.getMessage.contains("write.branch") ||
        Option(e.getCause).exists(_.getMessage.contains("write.branch")))
    }
    spark.sql("CALL bdml.system.drop_branch('db.guards', 'b')")
    assert(spark.table("bdml.db.guards").count() === 100L,
      "dropping the branch must discard its DML")
    // vector-mode table: branch DML rejects loudly
    val tv = mkTable("vec")
    spark.sql("CALL bdml.system.delete_mode('db.vec', 'vector')")
    spark.sql("CALL bdml.system.create_branch('db.vec', 'b')")
    onBranch("b") {
      val e = intercept[Exception](
        spark.sql("DELETE FROM bdml.db.vec WHERE id < 5"))
      def msgs(x: Throwable): Seq[String] = Option(x).toSeq.flatMap(y =>
        Option(y.getMessage).toSeq ++ msgs(y.getCause))
      assert(msgs(e).exists(_.contains("copy-on-write")),
        s"expected the MOR rejection, got: ${e.getMessage}")
    }
  }

  test("concurrent branch DMLs on ONE fork file all commit (claim + retry)") {
    val t = mkTable("conc")
    spark.sql("CALL bdml.system.create_branch('db.conc', 'b')")
    // three writers target DISJOINT rows of the same fork file: each
    // masks the file its plan read — the branch claim serializes the
    // commits and the DML auto-retry re-plans the losers over the
    // winner's replacement
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    try {
      spark.conf.set(ColeRefs.WapBranchConfKey, "b")
      val futures = (0 until 3).map { k =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            spark.sql(s"UPDATE bdml.db.conc SET s = 'W$k' WHERE g = $k")
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      val br = spark.read.format("cole").option("branch", "b").load(t)
      (0 until 3).foreach { k =>
        assert(br.filter(col("s") === s"W$k").count() === 20L,
          s"writer $k's rows lost in the concurrent branch DML")
      }
      assert(br.count() === 100L)
    } finally {
      spark.conf.unset(ColeRefs.WapBranchConfKey)
      pool.shutdownNow()
    }
    spark.sql("CALL bdml.system.fast_forward('db.conc', 'b')")
    val main = spark.table("bdml.db.conc")
    (0 until 3).foreach(k =>
      assert(main.filter(col("s") === s"W$k").count() === 20L))
  }

  test("MERGE INTO on a branch: update + insert land branched; publish applies") {
    val s = spark
    import s.implicits._
    val t = mkTable("mrg")
    spark.sql("CALL bdml.system.create_branch('db.mrg', 'b')")
    Seq((5L, 99, "upd"), (200L, 99, "ins")).toDF("id", "g", "s")
      .createOrReplaceTempView("bdml_mrg_src")
    onBranch("b") {
      spark.sql(
        """MERGE INTO bdml.db.mrg t USING bdml_mrg_src s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(spark.table("bdml.db.mrg").count() === 100L)
    assert(spark.table("bdml.db.mrg").filter(col("g") === 99).count() === 0L)
    val br = spark.read.format("cole").option("branch", "b").load(t)
    assert(br.count() === 101L && br.filter(col("g") === 99).count() === 2L)
    spark.sql("CALL bdml.system.fast_forward('db.mrg', 'b')")
    val main = spark.table("bdml.db.mrg")
    assert(main.count() === 101L && main.filter(col("g") === 99).count() === 2L)
  }
}
