package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branch row-level DML on a VERSIONED CLONE (r16, advice item #1): the
  * branch record masks rels the SOURCE owns, so publish cannot retire
  * them by rename — fastForward resolves foreignness through the live
  * clone pointer and COPY-retires those bytes under the clone's own log
  * (the versioned-clone main-lane discipline). Pinned here:
  *   - branch DML over foreign-backed rows is invisible on the clone's
  *     main AND leaves the source untouched byte-for-byte;
  *   - publish succeeds (previously: permanently stuck in `.publishing`
  *     on the masked-file-missing require), the clone's main then reads
  *     the audited state, the source is STILL untouched;
  *   - time travel to the pre-publish version serves the original rows
  *     (the copy-retired bytes are ordinary retired paths);
  *   - a mixed branch (foreign mask + local-staged DML) publishes both
  *     lanes in the same commit.
  */
class ColeCloneBranchDmlSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_cbd_wh").toString

  private lazy val spark: SparkSession = {
    // branch DML needs the ColeDmlRetry strategy — force a session WITH
    // GraftExtensions (config() on a shared session is a silent no-op)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.cbd", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cbd.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def mkClone(src: String, dst: String, n: Int = 60): (String, String) = {
    val s = spark
    import s.implicits._
    val sdir = s"$warehouse/db/$src"
    (0 until n).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "g", "s")
      .coalesce(2).write.format("cole").mode("overwrite").save(sdir)
    spark.sql(s"CALL cbd.system.versioning('db.$src')")
    spark.sql(s"CALL cbd.system.clone('db.$src', 'db.$dst')")
    spark.sql(s"CALL cbd.system.versioning('db.$dst')")
    (sdir, s"$warehouse/db/$dst")
  }

  private def onBranch[A](name: String)(f: => A): A = {
    spark.conf.set(ColeRefs.WapBranchConfKey, name)
    try f finally spark.conf.unset(ColeRefs.WapBranchConfKey)
  }

  private def fileState(t: String): Map[String, (Long, Long)] =
    ColeIO.listPartitioned(t, conf).map { case (st, _) =>
      st.getPath.toString -> (st.getLen, st.getModificationTime)
    }.toMap

  test("branch DML masking foreign files: invisible until publish, then copy-retired") {
    val (sdir, cdir) = mkClone("s1", "c1")
    val srcBefore = fileState(sdir)
    spark.sql("CALL cbd.system.create_branch('db.c1', 'audit')")
    val cloneBefore = fileState(cdir)
    onBranch("audit") {
      spark.sql("UPDATE cbd.db.c1 SET s = 'X' WHERE id < 10")
      spark.sql("DELETE FROM cbd.db.c1 WHERE id >= 55")
    }
    // the masks name SOURCE-owned rels — the exact shape that used to
    // wedge the publish
    assert(ColeRefs.branchMasks(cdir, conf, "audit").nonEmpty)
    // invisible everywhere: clone main and source byte-identical
    assert(fileState(cdir) === cloneBefore, "branch DML touched the clone")
    assert(fileState(sdir) === srcBefore, "branch DML touched the SOURCE")
    assert(spark.table("cbd.db.c1").count() === 60L)
    val br = spark.read.format("cole").option("branch", "audit").load(cdir)
    assert(br.count() === 55L)
    assert(br.filter(col("s") === "X").count() === 10L)
    // publish: must complete (copy-retire lane), one commit
    val vBefore = ColeVersions.currentVersion(cdir, conf)
    spark.sql("CALL cbd.system.fast_forward('db.c1', 'audit')")
    val main = spark.table("cbd.db.c1")
    assert(main.count() === 55L)
    assert(main.filter(col("s") === "X").count() === 10L)
    assert(main.filter(col("s") === "X").agg(max("id")).head().getLong(0) === 9L)
    assert(ColeVersions.currentVersion(cdir, conf) === vBefore + 1)
    // the source never moved
    assert(fileState(sdir) === srcBefore, "publish touched the SOURCE")
    // time travel to the pre-publish version: original rows, via the
    // copy-retired bytes
    val old = spark.read.format("cole")
      .option("versionAsOf", vBefore.toString).load(cdir)
    assert(old.count() === 60L &&
      old.filter(col("s") === "X").count() === 0L)
    // the branch is consumed
    assert(!ColeRefs.branches(cdir, conf).exists(_.name == "audit"))
  }

  test("mixed branch: foreign mask + local-staged DML publish in one commit") {
    val s = spark
    import s.implicits._
    val (sdir, cdir) = mkClone("s2", "c2")
    val srcBefore = fileState(sdir)
    spark.sql("CALL cbd.system.create_branch('db.c2', 'b')")
    // stage a local append on the branch, then DML BOTH lanes: rows that
    // live only in the staged file and rows backed by foreign bytes
    (100 until 120).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "g", "s")
      .coalesce(1).write.format("cole").option("branch", "b")
      .mode("append").save(cdir)
    onBranch("b") {
      spark.sql("UPDATE cbd.db.c2 SET s = 'L' WHERE id >= 110")
      spark.sql("UPDATE cbd.db.c2 SET s = 'F' WHERE id < 5")
      val br = spark.read.format("cole").option("branch", "b").load(cdir)
      assert(br.count() === 80L)
      assert(br.filter(col("s") === "L").count() === 10L)
      assert(br.filter(col("s") === "F").count() === 5L)
    }
    val vBefore = ColeVersions.currentVersion(cdir, conf)
    spark.sql("CALL cbd.system.fast_forward('db.c2', 'b')")
    val main = spark.table("cbd.db.c2")
    assert(main.count() === 80L)
    assert(main.filter(col("s") === "L").count() === 10L)
    assert(main.filter(col("s") === "F").count() === 5L)
    assert(fileState(sdir) === srcBefore, "publish touched the SOURCE")
    // pre-publish snapshot intact
    val old = spark.read.format("cole")
      .option("versionAsOf", vBefore.toString).load(cdir)
    assert(old.count() === 60L && old.filter(col("s") === "F").count() === 0L)
  }
}
