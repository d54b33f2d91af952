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
    // a crash-orphaned marker (its PROCESS died — abandon() stops the
    // heartbeat without releasing, the same-JVM stand-in) breaks after
    // the TTL
    val orphanConf = new org.apache.hadoop.conf.Configuration(conf)
    orphanConf.setLong(ColeClaims.TtlKey, 300L)
    orphanConf.setLong(ColeClaims.WaitKey, 20000L)
    ColeClaims.acquire(fs, orphanConf, t, Seq("dead.col"), "crashed").abandon()
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

  test("heartbeat: a LIVE holder stalled past the TTL keeps its claims; only a dead one expires") {
    val t = Files.createTempDirectory("cole_claims_hb").toString
    val conf = new org.apache.hadoop.conf.Configuration(ColeIO.driverConf())
    conf.setLong(ColeClaims.TtlKey, 400L) // heartbeat defaults to ttl/3
    conf.setLong(ColeClaims.WaitKey, 300L)
    val (fs, _) = ColeIO.resolve(t, conf)
    val holder = ColeClaims.acquire(fs, conf, t, Seq("slow.col"), "slow-commit")
    // the commit "runs long": 4x the TTL elapses while the holder lives
    Thread.sleep(1600)
    val before = ColeClaims.staleBreaks.get()
    // a second committer must PARK (and here time out) — never break the
    // live claim, even though its creation is long past the TTL
    val e = intercept[IllegalStateException] {
      ColeClaims.acquire(fs, conf, t, Seq("slow.col"), "contender")
    }
    assert(e.getMessage.contains("held by a concurrent committer"))
    assert(ColeClaims.staleBreaks.get() === before,
      "a heartbeating holder must never be broken as stale")
    holder.release()
    // whereas a holder whose process DIED (heartbeat gone) expires
    ColeClaims.acquire(fs, conf, t, Seq("slow.col"), "victim").abandon()
    Thread.sleep(600)
    val c = ColeClaims.acquire(fs, conf, t, Seq("slow.col"), "reaper")
    assert(ColeClaims.staleBreaks.get() > before)
    c.release()
  }

  test("heartbeat survives a setTimes-no-op filesystem (S3A-class) via the .hb sidecar") {
    // Hadoop's FileSystem.setTimes defaults to a NO-OP and S3A keeps it
    // that way — the beat must detect the ineffective touch and carry
    // liveness through an overwritten sidecar instead, or live holders
    // on object stores would be broken as stale (the exact failure the
    // heartbeat exists to prevent)
    val t = Files.createTempDirectory("cole_claims_noopts").toString
    val conf = new org.apache.hadoop.conf.Configuration(ColeIO.driverConf())
    conf.setLong(ColeClaims.TtlKey, 500L)
    conf.setLong(ColeClaims.WaitKey, 400L)
    val (real, _) = ColeIO.resolve(t, conf)
    val noTouch = new org.apache.hadoop.fs.FilterFileSystem(real) {
      override def setTimes(p: org.apache.hadoop.fs.Path,
          mtime: Long, atime: Long): Unit = () // S3A semantics
    }
    val holder = ColeClaims.acquire(noTouch, conf, t, Seq("obj.col"), "slow")
    Thread.sleep(1800) // 3+ TTLs; the marker's own mtime never advances
    val before = ColeClaims.staleBreaks.get()
    val e = intercept[IllegalStateException] {
      ColeClaims.acquire(noTouch, conf, t, Seq("obj.col"), "contender")
    }
    assert(e.getMessage.contains("held by a concurrent committer"))
    assert(ColeClaims.staleBreaks.get() === before,
      "live holder on a no-op-setTimes store must never be broken")
    holder.release()
    // a DEAD holder on the same store still expires (hb stops advancing)
    ColeClaims.acquire(noTouch, conf, t, Seq("obj.col"), "victim").abandon()
    Thread.sleep(700)
    val c = ColeClaims.acquire(noTouch, conf, t, Seq("obj.col"), "reaper")
    assert(ColeClaims.staleBreaks.get() > before)
    c.release()
  }

  test("racing breakers on one stale marker: never two holders, no fresh claim ever stolen") {
    // the r12 TOCTOU (ADVICE): two breakers both observe a stale marker;
    // the slower one must not delete the faster one's freshly re-created
    // claim. The break-lock re-check serializes stale-check -> delete, so
    // across many rounds at most one committer holds at any instant.
    val t = Files.createTempDirectory("cole_claims_brk").toString
    val conf = new org.apache.hadoop.conf.Configuration(ColeIO.driverConf())
    conf.setLong(ColeClaims.TtlKey, 500L)
    conf.setLong(ColeClaims.WaitKey, 30000L)
    val (fs, _) = ColeIO.resolve(t, conf)
    val marker = new org.apache.hadoop.fs.Path(s"$t/${ColeClaims.DirName}/hot.col.claim")
    val holders = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until 10).foreach { _ =>
      // plant a crash-orphaned marker, aged past the TTL
      fs.mkdirs(marker.getParent)
      val out = fs.create(marker, true)
      try out.write("op:crashed\n".getBytes) finally out.close()
      fs.setTimes(marker, System.currentTimeMillis() - 2000L, -1)
      val pool = Executors.newFixedThreadPool(4)
      val start = new CountDownLatch(1)
      val fails = (0 until 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
          override def call(): Option[Throwable] = {
            start.await()
            try {
              val c = ColeClaims.acquire(fs, conf, t, Seq("hot.col"), "breaker")
              val n = holders.incrementAndGet()
              maxSeen.updateAndGet(m => math.max(m, n))
              Thread.sleep(20) // widen any double-hold window
              holders.decrementAndGet()
              c.release()
              None
            } catch { case e: Throwable => Some(e) }
          }
        })
      }
      start.countDown()
      val errs = fails.flatMap(_.get(60, TimeUnit.SECONDS))
      pool.shutdown()
      assert(errs.isEmpty, s"breaker failed: ${errs.map(_.getMessage)}")
    }
    assert(maxSeen.get() === 1,
      s"mutual exclusion violated: ${maxSeen.get()} simultaneous holders")
  }

  test("claims under the conditional-PUT coordinator: disjoint succeed, overlap serializes (object-store semantics)") {
    // the r12 weak: raw create(overwrite=false) is check-then-act on
    // S3A-class stores. Claims now route through ColeCommitPrimitives, so
    // arming the conditional-PUT coordinator (the r10 contract harness
    // that reproduces object-store PUT-if-absent semantics over any FS)
    // must preserve both claim properties.
    val t = Files.createTempDirectory("cole_claims_cp").toString
    val conf = new org.apache.hadoop.conf.Configuration(ColeIO.driverConf())
    conf.set(ColeCommitPrimitives.ConfKey,
      classOf[ConditionalPutCommitPrimitives].getName)
    conf.setLong(ColeClaims.WaitKey, 30000L)
    val (fs, _) = ColeIO.resolve(t, conf)
    // disjoint sets across 8 threads x 10 rounds: all proceed unassisted
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val disjoint = (0 until 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean = {
          start.await()
          (0 until 10).foreach { r =>
            val c = ColeClaims.acquire(fs, conf, t, Seq(s"d$i-$r.col"), "cp")
            c.release()
          }
          true
        }
      })
    }
    start.countDown()
    assert(disjoint.forall(_.get(60, TimeUnit.SECONDS)))
    pool.shutdown()
    // overlap: one hot path, 8 threads — exactly one holder at a time
    val holders = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool2 = Executors.newFixedThreadPool(8)
    val start2 = new CountDownLatch(1)
    val overlap = (0 until 8).map { _ =>
      pool2.submit(new java.util.concurrent.Callable[Option[Throwable]] {
        override def call(): Option[Throwable] = {
          start2.await()
          try {
            (0 until 5).foreach { _ =>
              val c = ColeClaims.acquire(fs, conf, t, Seq("hot.col"), "cp")
              val n = holders.incrementAndGet()
              maxSeen.updateAndGet(m => math.max(m, n))
              Thread.sleep(5)
              holders.decrementAndGet()
              c.release()
            }
            None
          } catch { case e: Throwable => Some(e) }
        }
      })
    }
    start2.countDown()
    val errs = overlap.flatMap(_.get(120, TimeUnit.SECONDS))
    pool2.shutdown()
    assert(errs.isEmpty, s"overlap acquire failed: ${errs.map(_.getMessage)}")
    assert(maxSeen.get() === 1,
      s"conditional-PUT claims let ${maxSeen.get()} holders in at once")
  }

  test("DML races run unchanged with the conditional-PUT coordinator armed") {
    val s = spark
    import s.implicits._
    val hc = s.sparkContext.hadoopConfiguration
    hc.set(ColeCommitPrimitives.ConfKey,
      classOf[ConditionalPutCommitPrimitives].getName)
    try {
      val shards = 4
      shardedTable("cp_disjoint", shards)
      val pool = Executors.newFixedThreadPool(shards)
      val start = new CountDownLatch(1)
      val results = (0 until shards).map { sh =>
        pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
          override def call(): Option[Throwable] = {
            start.await()
            try {
              val src = s"race_cp_$sh"
              (0 until 200).map(i => ((sh * 1000 + i * 5).toLong, (sh + 1).toLong))
                .toDF("id", "nv").createOrReplaceTempView(src)
              s.sql(s"""MERGE INTO race.db.cp_disjoint t USING $src x ON t.id = x.id
                WHEN MATCHED THEN UPDATE SET v = x.nv""")
              None
            } catch { case e: Throwable => Some(e) }
          }
        })
      }
      start.countDown()
      val failures = results.flatMap(_.get(300, TimeUnit.SECONDS))
      pool.shutdown()
      assert(failures.isEmpty, s"disjoint MERGEs under conditional-PUT " +
        s"failed: ${failures.map(_.getMessage).mkString("; ")}")
      val got = s.table("race.db.cp_disjoint")
        .groupBy("v").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = (1 to shards).map(sh => sh.toLong -> 200L).toMap +
        (0L -> (shards * 1000L - shards * 200L))
      assert(got === expect)
      // overlap: winners commit, losers reject loudly — same contract
      shardedTable("cp_overlap", 1)
      val pool2 = Executors.newFixedThreadPool(4)
      val start2 = new CountDownLatch(1)
      val outcome = (0 until 4).map { k =>
        pool2.submit(new java.util.concurrent.Callable[Either[Throwable, Unit]] {
          override def call(): Either[Throwable, Unit] = {
            start2.await()
            try {
              val src = s"race_cpov_$k"
              (0 until 100).map(i => (i.toLong * 7, (k + 1).toLong * 100))
                .toDF("id", "nv").createOrReplaceTempView(src)
              s.sql(s"""MERGE INTO race.db.cp_overlap t USING $src x ON t.id = x.id
                WHEN MATCHED THEN UPDATE SET v = v + x.nv""")
              Right(())
            } catch { case e: Throwable => Left(e) }
          }
        })
      }
      start2.countDown()
      val res = outcome.map(_.get(300, TimeUnit.SECONDS))
      pool2.shutdown()
      assert(res.count(_.isRight) >= 1)
      res.collect { case Left(e) => e }.foreach { e =>
        def chain(t: Throwable): Seq[String] =
          if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
        assert(chain(e).exists(m => m != null &&
          m.contains("concurrent write detected")),
          s"unexpected failure kind under conditional-PUT: ${e.getMessage}")
      }
      val matched = (0 until 100).map(_.toLong * 7).filter(_ < 1000)
      val rows = s.table("race.db.cp_overlap").filter(col("id").isin(matched: _*))
        .select("v").collect().map(_.getLong(0)).distinct
      assert(rows.length === 1, s"matched rows diverged: ${rows.toSeq}")
      assert(rows.head % 100 === 0 && rows.head > 0)
    } finally hc.unset(ColeCommitPrimitives.ConfKey)
  }
}
