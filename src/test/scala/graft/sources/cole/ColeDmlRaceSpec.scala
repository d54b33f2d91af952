package graft.sources.cole

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent row-level DML on one table. File-DISJOINT operations (the
  * common sharded-writer shape: each committer's matched rows live in
  * its own files) must all succeed unassisted; operations whose
  * replaced-file sets OVERLAP must serialize — later losers reject
  * loudly with the table untouched, never silently interleave.
  *
  * Since r12 the mutual exclusion is [[ColeClaims]]: per-affected-file
  * markers created atomically IN STORAGE (`O_CREAT|O_EXCL` on local
  * filesystems), with no shared JVM lock anywhere on the DML commit
  * path — so these racing threads faithfully simulate racing driver
  * PROCESSES: every interleaving they exercise is serialized by file
  * system state a separate process would see identically, not by a
  * monitor a separate process would not.
  */
class ColeDmlRaceSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_race_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.race", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.race.warehouse", warehouse)
    s
  }

  /** One file per key shard: shard s holds keys [s*1000, s*1000+1000). */
  private def shardedTable(name: String, shards: Int): String = {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/$name"
    (0 until shards).foreach { sh =>
      (0 until 1000).map(i => ((sh * 1000 + i).toLong, 0L)).toDF("id", "v")
        .coalesce(1).write.format("cole").mode("append").save(t)
    }
    t
  }

  test("N concurrent file-disjoint MERGEs all succeed unassisted") {
    val s = spark
    import s.implicits._
    val shards = 4
    shardedTable("disjoint", shards)
    val pool = Executors.newFixedThreadPool(shards)
    val start = new CountDownLatch(1)
    val results = (0 until shards).map { sh =>
      pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
        override def call(): Option[Throwable] = {
          start.await()
          try {
            val src = s"race_src_$sh"
            (0 until 200).map(i => ((sh * 1000 + i * 5).toLong, (sh + 1).toLong))
              .toDF("id", "nv").createOrReplaceTempView(src)
            s.sql(s"""MERGE INTO race.db.disjoint t USING $src x ON t.id = x.id
              WHEN MATCHED THEN UPDATE SET v = x.nv""")
            None
          } catch { case e: Throwable => Some(e) }
        }
      })
    }
    start.countDown()
    val failures = results.flatMap(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty,
      s"disjoint concurrent MERGEs failed: ${failures.map(_.getMessage).mkString("; ")}")
    // every shard's update landed; nothing else moved
    val got = s.table("race.db.disjoint")
      .groupBy("v").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = (1 to shards).map(sh => sh.toLong -> 200L).toMap +
      (0L -> (shards * 1000L - shards * 200L))
    assert(got === expect)
  }

  test("overlapping concurrent MERGEs: winners commit, losers reject loudly, rows never interleave") {
    val s = spark
    import s.implicits._
    shardedTable("overlap", 1) // ONE file: every committer replaces it
    val n = 4
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results = (0 until n).map { k =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Unit]] {
        override def call(): Either[Throwable, Unit] = {
          start.await()
          try {
            val src = s"race_ov_$k"
            (0 until 100).map(i => (i.toLong * 7, (k + 1).toLong * 100))
              .toDF("id", "nv").createOrReplaceTempView(src)
            s.sql(s"""MERGE INTO race.db.overlap t USING $src x ON t.id = x.id
              WHEN MATCHED THEN UPDATE SET v = v + x.nv""")
            Right(())
          } catch { case e: Throwable => Left(e) }
        }
      })
    }
    start.countDown()
    val outcome = results.map(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    val winners = outcome.count(_.isRight)
    assert(winners >= 1, "at least one overlapping committer must win")
    // losers surfaced the loud concurrent-write rejection, nothing else
    outcome.collect { case Left(e) => e }.foreach { e =>
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
      assert(chain(e).exists(m => m != null &&
        m.contains("concurrent write detected")),
        s"unexpected failure kind: ${e.getMessage}")
    }
    // final state = exactly the winners' increments applied to every
    // matched row (serializable outcome, no partial interleave)
    val matched = (0 until 100).map(_.toLong * 7).filter(_ < 1000)
    val rows = s.table("race.db.overlap").filter(col("id").isin(matched: _*))
      .select("v").collect().map(_.getLong(0)).distinct
    assert(rows.length === 1, s"matched rows diverged: ${rows.toSeq}")
    assert(rows.head % 100 === 0 && rows.head > 0)
  }

  test("N concurrent key-disjoint vector DELETEs all succeed (merge-on-read path)") {
    val s = spark
    import s.implicits._
    val shards = 4
    val t = shardedTable("vdel", shards)
    ColeDv.setMode(t, ColeIO.driverConf(), "vector")
    val pool = Executors.newFixedThreadPool(shards)
    val start = new CountDownLatch(1)
    val results = (0 until shards).map { sh =>
      pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
        override def call(): Option[Throwable] = {
          start.await()
          try {
            s.sql(s"DELETE FROM race.db.vdel WHERE id >= ${sh * 1000} " +
              s"AND id < ${sh * 1000 + 100}")
            None
          } catch { case e: Throwable => Some(e) }
        }
      })
    }
    start.countDown()
    val failures = results.flatMap(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty,
      s"disjoint concurrent vector DELETEs failed: " +
        failures.map(_.getMessage).mkString("; "))
    assert(s.table("race.db.vdel").count() === shards * 1000L - shards * 100L)
    (0 until shards).foreach { sh =>
      assert(s.table("race.db.vdel")
        .filter(col("id") >= sh * 1000 && col("id") < sh * 1000 + 100)
        .count() === 0L, s"shard $sh delete lost")
    }
  }

  test("claims: overlap serializes, reversed orders don't deadlock, stale markers break") {
    val conf = ColeIO.driverConf()
    val t = Files.createTempDirectory("cole_claims").toString
    val (fs, _) = ColeIO.resolve(t, conf)
    // overlap: while one committer holds a claim, another's acquisition
    // parks; after release it proceeds
    val a = ColeClaims.acquire(fs, conf, t, Seq("f1.col", "f2.col"), "test")
    val started = new CountDownLatch(1)
    val got = new java.util.concurrent.atomic.AtomicBoolean(false)
    val th = new Thread(() => {
      started.countDown()
      val b = ColeClaims.acquire(fs, conf, t, Seq("f2.col", "f3.col"), "test")
      got.set(true)
      b.release()
    })
    th.start()
    started.await()
    Thread.sleep(200)
    assert(!got.get(), "overlapping acquisition must park while held")
    a.release()
    th.join(30000)
    assert(got.get(), "parked acquisition must proceed after release")
    // reversed acquisition orders: release-all between attempts means no
    // hold-and-wait deadlock — both eventually hold
    val pool = Executors.newFixedThreadPool(2)
    val ok = (0 until 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean = {
          (0 until 20).foreach { _ =>
            val sets = if (i == 0) Seq("g1", "g2", "g3") else Seq("g3", "g2", "g1")
            val c = ColeClaims.acquire(fs, conf, t, sets, "test")
            c.release()
          }
          true
        }
      })
    }
    assert(ok.forall(_.get(60, TimeUnit.SECONDS)))
    pool.shutdown()
    // a crash-orphaned marker (nobody releases it) breaks after the TTL
    val orphanConf = new org.apache.hadoop.conf.Configuration(conf)
    orphanConf.setLong(ColeClaims.TtlKey, 300L)
    orphanConf.setLong(ColeClaims.WaitKey, 20000L)
    ColeClaims.acquire(fs, orphanConf, t, Seq("dead.col"), "crashed") // never released
    Thread.sleep(400)
    val before = ColeClaims.staleBreaks.get()
    val c2 = ColeClaims.acquire(fs, orphanConf, t, Seq("dead.col"), "breaker")
    assert(ColeClaims.staleBreaks.get() > before, "stale marker must be broken")
    c2.release()
    // a LIVE marker inside its TTL is never broken: a short-wait acquirer
    // times out loudly instead
    val live = ColeClaims.acquire(fs, conf, t, Seq("live.col"), "holder")
    val impatient = new org.apache.hadoop.conf.Configuration(conf)
    impatient.setLong(ColeClaims.WaitKey, 300L)
    val e = intercept[IllegalStateException] {
      ColeClaims.acquire(fs, impatient, t, Seq("live.col"), "test")
    }
    assert(e.getMessage.contains("held by a concurrent committer"))
    live.release()
  }
}
