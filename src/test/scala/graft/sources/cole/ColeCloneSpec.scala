package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Zero-copy table CLONE ([[ColeClone]]): instant dev/test copies that
  * move no data bytes, pin their snapshot in the source's ref machinery,
  * survive source-side DML/compaction/expiry, accept appends, reject
  * what they cannot honor, and graduate to plain tables via localize.
  */
class ColeCloneSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_clone_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.ckc", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.ckc.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS ckc.db")
    s
  }

  private def conf = ColeIO.driverConf()

  private def colFiles(dir: String): Seq[java.io.File] = {
    def rec(f: java.io.File): Seq[java.io.File] = {
      val cs = Option(f.listFiles()).getOrElse(Array.empty).toSeq
      cs.filter(c => c.isFile && c.getName.endsWith(".col")) ++
        cs.filter(c => c.isDirectory && !c.getName.startsWith("_"))
          .flatMap(rec)
    }
    rec(new java.io.File(dir))
  }

  /** versioned source with two commits; returns its path. */
  private def makeSrc(name: String): String = {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/$name"
    (0 until 800).map(i => (i.toLong, s"t${i % 3}", i * 1.5))
      .toDF("id", "tag", "v")
      .coalesce(2).write.format("cole").mode("overwrite").save(dir)
    ColeVersions.enable(dir, conf) // v1
    (800 until 1000).map(i => (i.toLong, s"t${i % 3}", i * 1.5))
      .toDF("id", "tag", "v")
      .coalesce(1).write.format("cole").mode("append").save(dir) // v2
    dir
  }

  test("clone is zero-copy, reads the snapshot, and pins it in $refs") {
    makeSrc("s1")
    spark.sql("CALL ckc.system.clone('db.s1', 'db.c1')")
    assert(colFiles(s"$warehouse/db/c1").isEmpty,
      "a clone must hold NO data files")
    assert(spark.table("ckc.db.c1").count() === 1000)
    assert(spark.table("ckc.db.c1").agg(sum("id")).head().getLong(0) ===
      (0L until 1000L).sum)
    val refs = spark.sql("SELECT type FROM ckc.db.`s1$refs`")
      .collect().map(_.getString(0)).toSeq
    assert(refs.contains("clone"), "the pin must surface in $refs")
  }

  test("source DML, compaction and expiry never perturb the clone") {
    makeSrc("s2")
    spark.sql("CALL ckc.system.clone('db.s2', 'db.c2')")
    val before = spark.table("ckc.db.c2").orderBy("id").collect()
    spark.sql("DELETE FROM ckc.db.s2 WHERE id % 2 = 0") // v3: retires files
    spark.sql("INSERT INTO ckc.db.s2 VALUES (5000, 'x', 1.0)") // v4
    spark.sql("CALL ckc.system.compact('db.s2', 64)")
    spark.sql("CALL ckc.system.expire_versions('db.s2', 1)")
    val after = spark.table("ckc.db.c2").orderBy("id").collect()
    assert(after.toSeq === before.toSeq,
      "clone must read its pinned snapshot bit-exactly through src churn")
    // and the source itself moved on
    assert(spark.table("ckc.db.s2").count() === 501)
  }

  test("clone at an explicit version") {
    val dir = makeSrc("s3")
    spark.sql("CALL ckc.system.clone('db.s3', 'db.c3', version => 1)")
    assert(spark.table("ckc.db.c3").count() === 800,
      "version 1 predates the second append")
    assert(ColeClone.read(s"$warehouse/db/c3", conf).exists(_.version == 1L))
    assert(dir.nonEmpty)
  }

  test("appends land locally; reads span foreign + local") {
    makeSrc("s4")
    spark.sql("CALL ckc.system.clone('db.s4', 'db.c4')")
    spark.sql("INSERT INTO ckc.db.c4 VALUES (9999, 'new', 2.5)")
    val t = spark.table("ckc.db.c4")
    assert(t.count() === 1001)
    assert(t.filter(col("tag") === "new").count() === 1)
    assert(colFiles(s"$warehouse/db/c4").size === 1,
      "only the appended file is local")
    // filters over the mixed set stay exact
    assert(t.filter(col("id") < 100).count() === 100)
  }

  test("truncate, overwrite and compaction reject until localize") {
    makeSrc("s5")
    spark.sql("CALL ckc.system.clone('db.s5', 'db.c5')")
    def rejects(f: => Any): Unit = {
      val e = intercept[Exception](f)
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("localize")),
        s"expected the localize hint, got: ${e.getMessage}")
    }
    // row-level DML works (mask-don't-retire, ColeCloneDmlSpec) and
    // versioning works (ColeCloneVersionsSpec, r15) — the rejections are
    // the operations that RETIRE files wholesale or must observe the
    // whole directory
    rejects(spark.sql("TRUNCATE TABLE ckc.db.c5"))
    rejects {
      val s = spark
      import s.implicits._
      Seq((1L, "a", 1.0)).toDF("id", "tag", "v")
        .write.format("cole").mode("overwrite").save(s"$warehouse/db/c5")
    }
    rejects(spark.sql("CALL ckc.system.compact('db.c5', 64)"))
  }

  test("localize copies exactly the missing foreign bytes and graduates") {
    makeSrc("s6")
    spark.sql("CALL ckc.system.clone('db.s6', 'db.c6')")
    spark.sql("INSERT INTO ckc.db.c6 VALUES (9999, 'new', 2.5)")
    val before = spark.table("ckc.db.c6").orderBy("id").collect()
    val copied = spark.sql("CALL ckc.system.localize('db.c6')")
      .head().getLong(0)
    assert(copied === 3, "two v1 parts + one v2 append part")
    assert(spark.table("ckc.db.c6").orderBy("id").collect().toSeq ===
      before.toSeq, "localize must not change a single value")
    assert(ColeClone.read(s"$warehouse/db/c6", conf).isEmpty)
    assert(ColeRefs.clonePins(s"$warehouse/db/s6", conf).isEmpty,
      "graduation releases the pin")
    // the full write surface returns
    spark.sql("DELETE FROM ckc.db.c6 WHERE id = 0")
    assert(spark.table("ckc.db.c6").count() === before.length - 1)
    ColeVersions.enable(s"$warehouse/db/c6", conf)
    // idempotent: a second localize is a no-op
    assert(spark.sql("CALL ckc.system.localize('db.c6')")
      .head().getLong(0) === 0)
  }

  test("a locally-present rel shadows its foreign twin (crash-safe resume)") {
    makeSrc("s7")
    spark.sql("CALL ckc.system.clone('db.s7', 'db.c7')")
    // simulate a localize that crashed after one file: copy one foreign
    // file to its local rel by hand
    val cs = ColeClone.read(s"$warehouse/db/c7", conf).get
    val (rel, phys) = ColeVersions.snapshotState(cs.src, conf, cs.version)
      .files.head
    val from = java.nio.file.Paths.get(phys.stripPrefix("file:"))
    val to = java.nio.file.Paths.get(s"$warehouse/db/c7/$rel")
    java.nio.file.Files.createDirectories(to.getParent)
    java.nio.file.Files.copy(from, to)
    // no duplicates: the local copy shadows the foreign one
    assert(spark.table("ckc.db.c7").count() === 1000)
    // resume copies only the remaining two
    assert(spark.sql("CALL ckc.system.localize('db.c7')")
      .head().getLong(0) === 2)
    assert(spark.table("ckc.db.c7").count() === 1000)
  }

  test("deep clone = clone + localize in one call") {
    makeSrc("s8")
    spark.sql("CALL ckc.system.clone('db.s8', 'db.c8', deep => true)")
    assert(ColeClone.read(s"$warehouse/db/c8", conf).isEmpty)
    assert(ColeRefs.clonePins(s"$warehouse/db/s8", conf).isEmpty)
    assert(spark.table("ckc.db.c8").count() === 1000)
    assert(colFiles(s"$warehouse/db/c8").size === 3)
  }

  test("DROP TABLE of a clone releases the source pin") {
    makeSrc("s9")
    spark.sql("CALL ckc.system.clone('db.s9', 'db.c9')")
    assert(ColeRefs.clonePins(s"$warehouse/db/s9", conf).size === 1)
    spark.sql("DROP TABLE ckc.db.c9")
    assert(ColeRefs.clonePins(s"$warehouse/db/s9", conf).isEmpty)
  }

  test("a pinned SOURCE refuses DROP TABLE until its clones release") {
    makeSrc("s12")
    spark.sql("CALL ckc.system.clone('db.s12', 'db.c12')")
    val e = intercept[Exception] { spark.sql("DROP TABLE ckc.db.s12") }
    assert(e.getMessage.contains("clone") &&
      e.getMessage.contains("drop_clone_pin"),
      s"expected the pinned-source rejection, got ${e.getMessage}")
    // the clone still reads through the intact source
    assert(spark.table("ckc.db.c12").count() === 1000)
    // releasing the pin (drop the clone) unlocks the drop
    spark.sql("DROP TABLE ckc.db.c12")
    spark.sql("DROP TABLE ckc.db.s12")
    intercept[Exception] { spark.table("ckc.db.s12").count() }
  }

  test("CREATE TABLE cannot clobber a spec-less clone; RTAS of a clone releases its pin") {
    makeSrc("s13")
    spark.sql("CALL ckc.system.clone('db.s13', 'db.c13')")
    // the clone holds ONLY _clonesrc (+ copied sidecars): still a table
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE ckc.db.c13 (x BIGINT)")
    }
    assert(e.getMessage.toLowerCase.contains("exists") ||
      e.getMessage.toLowerCase.contains("already"))
    // REPLACE TABLE AS SELECT retires the clone wholesale — and must
    // release its pin in the source like DROP does
    spark.sql("REPLACE TABLE ckc.db.c13 AS SELECT id FROM range(5)")
    assert(spark.table("ckc.db.c13").count() === 5)
    assert(ColeRefs.clonePins(s"$warehouse/db/s13", conf).isEmpty,
      "RTAS of a clone must release the source pin")
  }

  test("drop_clone_pin force-releases a lost clone's pin") {
    makeSrc("s14")
    spark.sql("CALL ckc.system.clone('db.s14', 'db.c14')")
    val pin = ColeRefs.clonePins(s"$warehouse/db/s14", conf).keys.head
    // simulate a LOST clone (directory removed out-of-band, pin leaked)
    val (fs, dp) = ColeIO.resolve(s"$warehouse/db/c14", conf)
    fs.delete(dp, true)
    assert(ColeRefs.clonePins(s"$warehouse/db/s14", conf).size === 1)
    val dropped = spark.sql(
      s"CALL ckc.system.drop_clone_pin('db.s14', '$pin')").head().getBoolean(0)
    assert(dropped)
    assert(ColeRefs.clonePins(s"$warehouse/db/s14", conf).isEmpty)
    spark.sql("DROP TABLE ckc.db.s14") // now unpinned — drops cleanly
  }

  test("guardrails: unversioned source, existing dest, vector debt") {
    val s = spark
    import s.implicits._
    val flat = s"$warehouse/db/flat"
    Seq((1L, "a")).toDF("id", "tag")
      .write.format("cole").mode("overwrite").save(flat)
    val e1 = intercept[Exception] {
      spark.sql("CALL ckc.system.clone('db.flat', 'db.cx')")
    }
    assert(e1.getMessage.contains("versioned"))
    makeSrc("s10")
    val e2 = intercept[Exception] {
      spark.sql("CALL ckc.system.clone('db.s10', 'db.s10')")
    }
    assert(e2.getMessage.contains("exists"))
    // vector debt rejects with the compact hint
    spark.sql("CALL ckc.system.delete_mode('db.s10', 'vector')")
    spark.sql("DELETE FROM ckc.db.s10 WHERE id = 0")
    val e3 = intercept[Exception] {
      spark.sql("CALL ckc.system.clone('db.s10', 'db.cy')")
    }
    assert(e3.getMessage.contains("deletion vectors"))
  }

  test("cloning a hive-partitioned table keeps partition pruning") {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/part"
    (0 until 600).map(i => (i.toLong, i * 1.0, s"p${i % 3}"))
      .toDF("id", "v", "k")
      .write.format("cole").mode("overwrite")
      .option("partitionBy", "k").save(dir)
    ColeVersions.enable(dir, conf)
    spark.sql("CALL ckc.system.clone('db.part', 'db.cpart')")
    val t = spark.table("ckc.db.cpart")
    assert(t.schema.fieldNames.contains("k"))
    assert(t.filter(col("k") === "p1").count() === 200)
    assert(t.groupBy("k").count().collect().map(_.getLong(1)).toSeq ===
      Seq(200L, 200L, 200L))
  }
}
