package graft.sources.cole

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operation-level auto-retry for overlapping row-level DML (r13): with
  * GraftExtensions active, a committer that loses the claims/(len,mtime)
  * race re-plans the SAME logical statement against the new snapshot and
  * re-executes — bounded — so overlapping UPDATE/MERGE/DELETE all commit
  * serially with NO user action, and the final state equals sequential
  * execution. With retries disabled (maxRetries=0) the r12 contract is
  * unchanged: the loser rejects loudly with the table untouched.
  */
class ColeDmlRetrySpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_retry_wh").toString

  private lazy val spark: SparkSession = {
    // getOrCreate would silently reuse another suite's extension-less
    // session; clear the singletons so this builder really applies
    // GraftExtensions (the SparkContext itself is still shared)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.retry", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.retry.warehouse", warehouse)
    s
  }

  /** ONE file: every committer's replaced-file set overlaps. */
  private def oneFileTable(name: String, rows: Int = 1000): String = {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/$name"
    (0 until rows).map(i => (i.toLong, 0L)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    t
  }

  private def race[T](n: Int)(body: Int => T): Seq[Either[Throwable, T]] = {
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val futs = (0 until n).map { k =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, T]] {
        override def call(): Either[Throwable, T] = {
          start.await()
          // each worker thread needs the extension session active
          org.apache.spark.sql.SparkSession.setActiveSession(spark)
          try Right(body(k)) catch { case e: Throwable => Left(e) }
        }
      })
    }
    start.countDown()
    val out = futs.map(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    out
  }

  test("overlapping MERGEs on one file ALL commit unassisted; final state = sequential execution") {
    val s = spark
    import s.implicits._
    oneFileTable("ov_merge")
    val n = 3
    val before = ColeDmlRetry.retries.get()
    val results = race(n) { k =>
      val src = s"retry_src_$k"
      (0 until 100).map(i => (i.toLong * 7, (k + 1).toLong * 100))
        .toDF("id", "nv").createOrReplaceTempView(src)
      s.sql(s"""MERGE INTO retry.db.ov_merge t USING $src x ON t.id = x.id
        WHEN MATCHED THEN UPDATE SET v = v + x.nv""")
    }
    val failures = results.collect { case Left(e) => e }
    assert(failures.isEmpty, "every overlapping committer must succeed " +
      s"via auto-retry: ${failures.map(_.getMessage).mkString("; ")}")
    // serializable outcome: every matched row carries the SUM of all
    // increments (100 + 200 + 300), unmatched rows untouched
    val matched = (0 until 100).map(_.toLong * 7).filter(_ < 1000)
    val vs = s.table("retry.db.ov_merge")
      .filter(col("id").isin(matched: _*))
      .select("v").collect().map(_.getLong(0)).distinct
    assert(vs.toSeq === Seq((1 to n).map(_ * 100).sum.toLong),
      s"matched rows must hold the sum of every committer's increment, got ${vs.toSeq}")
    assert(s.table("retry.db.ov_merge").filter(col("v") === 0L).count()
      === 1000L - matched.size)
    assert(ColeDmlRetry.retries.get() > before,
      "overlap must have exercised at least one re-plan")
  }

  test("overlapping UPDATEs on a vector-mode table (merge-on-read WriteDelta path) all commit") {
    val s = spark
    oneFileTable("ov_mor")
    ColeDv.setMode(s"$warehouse/db/ov_mor", ColeIO.driverConf(), "vector")
    val n = 3
    val results = race(n) { k =>
      s.sql(s"UPDATE retry.db.ov_mor SET v = v + ${(k + 1) * 10} " +
        s"WHERE id >= 100 AND id < 200")
    }
    val failures = results.collect { case Left(e) => e }
    assert(failures.isEmpty,
      s"MOR overlap must auto-retry: ${failures.map(_.getMessage).mkString("; ")}")
    val vs = s.table("retry.db.ov_mor")
      .filter(col("id") >= 100 && col("id") < 200)
      .select("v").collect().map(_.getLong(0)).distinct
    assert(vs.toSeq === Seq((1 to n).map(_ * 10).sum.toLong),
      s"expected summed increments on every updated row, got ${vs.toSeq}")
    assert(s.table("retry.db.ov_mor").count() === 1000L)
  }

  test("overlapping copy-on-write DELETEs on one file all commit (connector-internal retry)") {
    val s = spark
    oneFileTable("ov_del")
    val n = 3
    val results = race(n) { k =>
      s.sql(s"DELETE FROM retry.db.ov_del WHERE id >= ${k * 100} " +
        s"AND id < ${k * 100 + 50}")
    }
    val failures = results.collect { case Left(e) => e }
    assert(failures.isEmpty,
      s"DELETE overlap must auto-retry: ${failures.map(_.getMessage).mkString("; ")}")
    assert(s.table("retry.db.ov_del").count() === 1000L - n * 50L)
    (0 until n).foreach { k =>
      assert(s.table("retry.db.ov_del")
        .filter(col("id") >= k * 100 && col("id") < k * 100 + 50)
        .count() === 0L, s"committer $k's delete lost")
    }
  }

  test("UPDATE racing a rebucket parks on its claims, then auto-retries against the rewritten layout") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rbk"
    (0 until 2000).map(i => (i.toLong, 0L)).toDF("id", "v")
      .write.format("cole").mode("overwrite").option("bucketBy", "2:id").save(t)
    ColeBucket.evolve(t, ColeIO.driverConf(), 4, Seq("id"))
    // the rebucket holds claims on every era-0 file for its whole
    // read→swap window; the UPDATE launched inside that window must
    // park at its commit, lose the (len,mtime) race once the swap
    // lands, and RE-PLAN against the rewritten files — landing with no
    // user action and exact values
    val updateDone = new java.util.concurrent.atomic.AtomicReference[Option[Throwable]](None)
    val updater = new Thread(() => {
      org.apache.spark.sql.SparkSession.setActiveSession(s)
      try s.sql("UPDATE retry.db.rbk SET v = v + 7 WHERE id < 500")
      catch { case e: Throwable => updateDone.set(Some(e)) }
    })
    ColeRebucket.afterClaimsHook.set(() => {
      updater.start()
      Thread.sleep(800) // let the UPDATE plan + rewrite + park at commit
    })
    try {
      val st = ColeRebucket.rebucket(s, t)
      assert(st.filesRewritten > 0)
    } finally ColeRebucket.afterClaimsHook.set(() => ())
    updater.join(120000)
    assert(!updater.isAlive, "UPDATE never completed")
    assert(updateDone.get().isEmpty,
      s"UPDATE must auto-retry after the rebucket: ${updateDone.get().map(_.getMessage)}")
    assert(s.table("retry.db.rbk").filter(col("v") === 7L).count() === 500L)
    assert(s.table("retry.db.rbk").filter(col("v") === 0L).count() === 1500L)
    // the rewrite and the update composed: every file is active-era
    val conf = ColeIO.driverConf()
    assert(ColeMetaCache.infos(t, conf)
      .forall(_.partValues.toMap.contains(ColeBucket.dirKeyOf(1))))
  }

  test("maxRetries=0 restores the loud reject; a genuinely persistent conflict is never spun on") {
    val s = spark
    import s.implicits._
    oneFileTable("ov_off")
    val hc = s.sparkContext.hadoopConfiguration
    hc.setInt(ColeDmlRetry.MaxRetriesKey, 0)
    try {
      val results = race(4) { k =>
        val src = s"retry_off_$k"
        (0 until 100).map(i => (i.toLong * 7, (k + 1).toLong * 100))
          .toDF("id", "nv").createOrReplaceTempView(src)
        s.sql(s"""MERGE INTO retry.db.ov_off t USING $src x ON t.id = x.id
          WHEN MATCHED THEN UPDATE SET v = v + x.nv""")
      }
      val winners = results.count(_.isRight)
      assert(winners >= 1)
      results.collect { case Left(e) => e }.foreach { e =>
        assert(ColeDmlRetry.isConflict(e),
          s"disabled retry must surface the loud conflict, got: ${e.getMessage}")
      }
      // rows never interleave even with retries off
      val matched = (0 until 100).map(_.toLong * 7).filter(_ < 1000)
      val vs = s.table("retry.db.ov_off").filter(col("id").isin(matched: _*))
        .select("v").collect().map(_.getLong(0)).distinct
      assert(vs.length === 1 && vs.head % 100 === 0 && vs.head > 0)
    } finally hc.unset(ColeDmlRetry.MaxRetriesKey)
  }

  test("single-statement semantics unchanged through the retry exec (no conflict path)") {
    val s = spark
    oneFileTable("solo", 100)
    val execsBefore = ColeDmlRetry.executions.get()
    s.sql("UPDATE retry.db.solo SET v = id * 2 WHERE id < 10")
    val got = s.table("retry.db.solo").filter(col("id") < 10)
      .orderBy("id").select("v").collect().map(_.getLong(0)).toSeq
    assert(got === (0 until 10).map(_.toLong * 2))
    assert(s.table("retry.db.solo").filter(col("v") =!= 0L).count() === 9L)
    // the retry exec is actually what planned the statement
    assert(ColeDmlRetry.executions.get() > execsBefore,
      "UPDATE did not route through ColeDmlRetryExec despite extensions")
  }
}
