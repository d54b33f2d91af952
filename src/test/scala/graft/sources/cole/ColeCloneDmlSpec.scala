package graft.sources.cole

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level DML on zero-copy clones ([[ColeClone]] mask-don't-retire):
  * UPDATE/MERGE/DELETE run the ordinary copy-on-write rewrite, but a
  * replaced file the SOURCE owns is HIDDEN behind the clone pointer
  * (`mask:` entries) instead of retired — the source's bytes never move,
  * the replacement rows land as ordinary local files, and localize never
  * copies a masked rel. Overlapping clone committers are caught by the
  * mask re-read under claims (a foreign file's bytes don't change when a
  * masker wins, so the (len,mtime) check alone is blind) and heal via
  * the DML auto-retry.
  */
class ColeCloneDmlSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_clonedml_wh").toString

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.cdml", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cdml.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS cdml.db")
    s
  }

  private def conf = ColeIO.driverConf()

  private def fileState(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] = {
      val cs = Option(f.listFiles()).getOrElse(Array.empty).toSeq
      cs.filter(_.isFile) ++ cs.filter(_.isDirectory).flatMap(walk)
    }
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".col"))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
  }

  private def localCols(dir: String): Int = {
    def rec(f: java.io.File): Seq[java.io.File] = {
      val cs = Option(f.listFiles()).getOrElse(Array.empty).toSeq
      cs.filter(c => c.isFile && c.getName.endsWith(".col")) ++
        cs.filter(c => c.isDirectory && !c.getName.startsWith("_")).flatMap(rec)
    }
    rec(new java.io.File(dir)).size
  }

  /** versioned 2-file source with a DETERMINISTIC split at id 500
    * (repartitionByRange samples its boundaries — a ~500 split is not a
    * 500 split, and the whole-file assertions here need exactness).
    */
  private def makeSrc(name: String): String = {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/$name"
    val df = (0 until 1000).map(i => (i.toLong, s"t${i % 3}", i.toLong))
      .toDF("id", "tag", "v")
    df.filter(col("id") < 500).coalesce(1)
      .write.format("cole").mode("overwrite").save(dir)
    df.filter(col("id") >= 500).coalesce(1)
      .write.format("cole").mode("append").save(dir)
    ColeVersions.enable(dir, conf) // v1
    dir
  }

  test("UPDATE masks the foreign file; the source is untouched byte-for-byte") {
    val src = makeSrc("u1")
    spark.sql("CALL cdml.system.clone('db.u1', 'db.cu1')")
    val srcBefore = fileState(src)
    spark.sql("UPDATE cdml.db.cu1 SET v = v + 1000 WHERE id < 100")
    assert(fileState(src) === srcBefore,
      "a clone's DML must never move or modify SOURCE bytes")
    val t = spark.table("cdml.db.cu1")
    assert(t.count() === 1000)
    assert(t.filter(col("v") >= 1000).count() === 100)
    assert(t.filter(col("id") < 100 && col("v") < 1000).count() === 0)
    // the touched foreign file is masked; its survivors landed locally
    val cs = ColeClone.read(s"$warehouse/db/cu1", conf).get
    assert(cs.masked.size === 1, s"one of two files touched, got ${cs.masked}")
    assert(localCols(s"$warehouse/db/cu1") >= 1)
    // the source still reads its own full state
    assert(spark.table("cdml.db.u1").filter(col("v") >= 1000).count() === 0)
  }

  test("DELETE: partial masks+rewrites; whole-file delete masks with no replacement") {
    makeSrc("d1")
    spark.sql("CALL cdml.system.clone('db.d1', 'db.cd1')")
    // whole first file (ids 0..499 under range partitioning)
    spark.sql("DELETE FROM cdml.db.cd1 WHERE id < 500")
    val t = spark.table("cdml.db.cd1")
    assert(t.count() === 500)
    assert(t.agg(min("id")).head().getLong(0) === 500L)
    val cs = ColeClone.read(s"$warehouse/db/cd1", conf).get
    assert(cs.masked.size === 1)
    assert(localCols(s"$warehouse/db/cd1") === 0,
      "a fully-deleted foreign file leaves NO replacement file")
    // partial delete on the second (still foreign) file
    spark.sql("DELETE FROM cdml.db.cd1 WHERE id >= 900")
    assert(spark.table("cdml.db.cd1").count() === 400)
    assert(ColeClone.read(s"$warehouse/db/cd1", conf).get.masked.size === 2)
    assert(localCols(s"$warehouse/db/cd1") === 1)
  }

  test("MERGE INTO a clone; a second DML over the now-local replacement retires normally") {
    val s = spark
    import s.implicits._
    makeSrc("m1")
    spark.sql("CALL cdml.system.clone('db.m1', 'db.cm1')")
    Seq((0L, "zz", 5000L), (1000L, "new", 1L)).toDF("id", "tag", "v")
      .createOrReplaceTempView("clone_merge_src")
    spark.sql(
      """MERGE INTO cdml.db.cm1 t USING clone_merge_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = spark.table("cdml.db.cm1")
    assert(t.count() === 1001)
    assert(t.filter(col("id") === 0).head().getString(1) === "zz")
    assert(t.filter(col("id") === 1000).count() === 1)
    // the replacement file is LOCAL now: updating it again goes the
    // ordinary retire path, and the mask does not grow
    val masks = ColeClone.read(s"$warehouse/db/cm1", conf).get.masked.size
    spark.sql("UPDATE cdml.db.cm1 SET v = 0 WHERE id = 0")
    assert(spark.table("cdml.db.cm1")
      .filter(col("id") === 0).head().getLong(2) === 0L)
    assert(ColeClone.read(s"$warehouse/db/cm1", conf).get.masked.size === masks)
  }

  test("masked rels never localize — deleted rows cannot resurrect") {
    makeSrc("l1")
    spark.sql("CALL cdml.system.clone('db.l1', 'db.cl1')")
    spark.sql("DELETE FROM cdml.db.cl1 WHERE id < 500") // masks file 1
    val before = spark.table("cdml.db.cl1").orderBy("id").collect()
    val copied = spark.sql("CALL cdml.system.localize('db.cl1')")
      .head().getLong(0)
    assert(copied === 1, "only the unmasked foreign file copies")
    assert(spark.table("cdml.db.cl1").orderBy("id").collect().toSeq ===
      before.toSeq)
    assert(spark.table("cdml.db.cl1").filter(col("id") < 500).count() === 0,
      "masked (deleted) rows must not resurrect through localize")
    assert(ColeClone.read(s"$warehouse/db/cl1", conf).isEmpty)
  }

  test("overlapping clone UPDATEs on ONE foreign file all commit (mask conflict + retry)") {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/r1"
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    ColeVersions.enable(dir, conf)
    spark.sql("CALL cdml.system.clone('db.r1', 'db.cr1')")
    val n = 3
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val futs = (0 until n).map { k =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Unit]] {
        override def call(): Either[Throwable, Unit] = {
          start.await()
          SparkSession.setActiveSession(spark)
          try Right(spark.sql(s"UPDATE cdml.db.cr1 SET v = v + ${(k + 1) * 1000} " +
            "WHERE id >= 100 AND id < 200"): Unit)
          catch { case e: Throwable => Left(e) }
        }
      })
    }
    start.countDown()
    val results = futs.map(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    val failures = results.collect { case Left(e) => e }
    assert(failures.isEmpty,
      s"clone DML overlap must auto-retry: ${failures.map(_.getMessage).mkString("; ")}")
    val vs = spark.table("cdml.db.cr1")
      .filter(col("id") >= 100 && col("id") < 200)
      .select((col("v") - col("id")).as("d")).distinct().collect()
      .map(_.getLong(0))
    assert(vs.toSeq === Seq((1 to n).map(_ * 1000).sum.toLong),
      s"expected all increments applied once each, got ${vs.toSeq}")
    assert(spark.table("cdml.db.cr1").count() === 1000L)
  }

  test("merge-on-read (vector) mode rejects on a clone with foreign files") {
    makeSrc("v1t")
    spark.sql("CALL cdml.system.clone('db.v1t', 'db.cv1')")
    // vector mode is rejected AT THE MODE SWITCH (ADVICE r13): with the
    // mode file present, scans would read .dv sidecars adjacent to the
    // clone's FOREIGN files — the SOURCE's live tree — so vectors the
    // source writes after the clone would silently drop rows from the
    // pinned snapshot. Reject before the trap can exist.
    val e = intercept[Exception] {
      spark.sql("CALL cdml.system.delete_mode('db.cv1', 'vector')")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("localize") &&
      m.contains("delete_mode")),
      s"expected the localize hint, got ${e.getMessage}")
    // copy-mode DML works (mask-don't-retire)
    spark.sql("UPDATE cdml.db.cv1 SET v = 0 WHERE id = 1")
    assert(spark.table("cdml.db.cv1")
      .filter(col("id") === 1).head().getLong(2) === 0L)
    // and a SOURCE-side vector delete after the clone never leaks into
    // the clone's snapshot: the source shrinks, the clone's pinned rows
    // and its $files debt accounting stay untouched even with live .dv
    // sidecars now adjacent to the foreign files
    val srcN = spark.table("cdml.db.v1t").count()
    spark.sql("CALL cdml.system.delete_mode('db.v1t', 'vector')")
    spark.sql("DELETE FROM cdml.db.v1t WHERE id = 2")
    assert(spark.table("cdml.db.v1t").count() == srcN - 1)
    assert(spark.table("cdml.db.cv1").count() == srcN,
      "a post-clone source vector DELETE leaked into the pinned snapshot")
    assert(spark.sql("SELECT sum(deleted_rows) FROM cdml.db.cv1.`$files`")
      .head().getLong(0) == 0L,
      "$files charged the source's post-clone vectors to the clone")
  }
}
