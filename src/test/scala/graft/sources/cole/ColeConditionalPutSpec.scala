package graft.sources.cole

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The conditional-PUT commit coordinator
  * ([[ConditionalPutCommitPrimitives]]): the reference object-store
  * backend — stage invisibly, publish atomically-if-absent at close.
  * Contract pinned here:
  *   - at most ONE committer per path succeeds under real cross-thread
  *     concurrency (hard-link publish is atomic at the OS, not
  *     check-then-act like local `create(overwrite=false)`);
  *   - losers observe FileAlreadyExistsException and the winner's bytes
  *     are COMPLETE (whole-object visibility);
  *   - a crash mid-write leaves NO object at the destination — torn
  *     records are impossible on this backend;
  *   - the whole versioning + DML surface (enable / append / DELETE /
  *     UPDATE / time travel / rollback / racing committers) runs
  *     unchanged with the coordinator armed via
  *     `graft.cole.commit.primitives`.
  */
class ColeConditionalPutSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def condConf(): Configuration = {
    val c = new Configuration(ColeIO.driverConf())
    c.set(ColeCommitPrimitives.ConfKey,
      classOf[ConditionalPutCommitPrimitives].getName)
    c
  }

  test("CAS contract: one winner per path under 32-way concurrency, body complete") {
    val dir = Files.createTempDirectory("cole_condput_cas").toString
    val conf = condConf()
    val (fs, _) = ColeIO.resolve(dir, conf)
    val prims = ColeCommitPrimitives.of(conf)
    assert(prims.isInstanceOf[ConditionalPutCommitPrimitives])
    (0 until 5).foreach { round =>
      val p = new HPath(dir, s"v$round")
      val wins = new AtomicInteger(0)
      val losses = new AtomicInteger(0)
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(32)
      (0 until 32).foreach { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            try {
              val out = prims.exclusiveCreate(fs, p)
              // the body names its writer; the reader below proves the
              // winner's COMPLETE body survived, nobody interleaved
              try out.write(s"writer-$t-".getBytes ++
                Array.fill(4096)('x'.toByte) ++ s"-end-$t".getBytes)
              finally out.close()
              wins.incrementAndGet()
            } catch {
              case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
                losses.incrementAndGet()
            }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(wins.get() === 1, s"round $round: want exactly one CAS winner")
      assert(losses.get() === 31)
      val in = fs.open(p)
      val body = try new String(in.readAllBytes()) finally in.close()
      val w = body.substring("writer-".length, body.indexOf('-', "writer-".length))
      assert(body.startsWith(s"writer-$w-") && body.endsWith(s"-end-$w"),
        "winner's object must be complete and single-writer")
    }
    // no staging garbage visible to the log reader (dotted names only)
    val leftovers = fs.listStatus(new HPath(dir))
      .map(_.getPath.getName).filterNot(_.startsWith("."))
    assert(leftovers.sorted.toSeq === (0 until 5).map(r => s"v$r"))
  }

  test("crash mid-write: destination never exists (torn records impossible)") {
    val dir = Files.createTempDirectory("cole_condput_crash").toString
    val conf = condConf()
    val (fs, _) = ColeIO.resolve(dir, conf)
    val prims = ColeCommitPrimitives.of(conf)
    val p = new HPath(dir, "v1")
    val out = prims.exclusiveCreate(fs, p)
    out.write("partial body with no end".getBytes)
    // simulated crash: the stream is abandoned, close() never runs
    assert(!fs.exists(p),
      "conditional PUT must not expose the object before publish")
    // a later committer takes the number cleanly
    val out2 = prims.exclusiveCreate(fs, p)
    try out2.write("complete".getBytes) finally out2.close()
    val in = fs.open(p)
    assert(new String(try in.readAllBytes() finally in.close()) === "complete")
  }

  test("versioning + DML surface runs unchanged over the coordinator") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("cole_condput_wh").toString
    // arm the coordinator for EVERY internal driverConf() in the flow
    val hc = s.sparkContext.hadoopConfiguration
    hc.set(ColeCommitPrimitives.ConfKey,
      classOf[ConditionalPutCommitPrimitives].getName)
    try {
      s.conf.set("spark.sql.catalog.cpw", "graft.sources.cole.ColeCatalog")
      s.conf.set("spark.sql.catalog.cpw.warehouse", wh)
      val t = s"$wh/db/t"
      (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(2)
        .write.format("cole").mode("overwrite").save(t)
      ColeVersions.enable(t, ColeIO.driverConf()) // v1
      (1000 until 1200).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
        .write.format("cole").mode("append").save(t) // v2
      spark.sql("DELETE FROM cpw.db.t WHERE k < 100") // v3
      spark.sql("UPDATE cpw.db.t SET v = v + 5000 WHERE k >= 1100") // v4
      def asOf(v: Long) =
        s.read.format("cole").option("versionAsOf", v.toString).load(t)
      assert(asOf(1).count() === 1000L)
      assert(asOf(2).count() === 1200L)
      assert(asOf(3).count() === 1100L)
      assert(spark.table("cpw.db.t").filter(col("k") === 1150L)
        .select("v").head.getLong(0) === 6150L)
      // rollback through the coordinator: v5 restores the pre-UPDATE state
      ColeVersions.rollback(t, ColeIO.driverConf(), 3L)
      assert(spark.table("cpw.db.t").count() === 1100L)
      assert(spark.table("cpw.db.t").filter(col("k") === 1150L)
        .select("v").head.getLong(0) === 1150L)
      // racing committers: both records land, distinct versions
      val latch = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(2)
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      (0 until 2).foreach { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            latch.await()
            ColeVersions.commitIfEnabled(t, ColeIO.driverConf(),
              s"race-$i", Seq(s"race$i.col"), Seq.empty).foreach(got.add(_))
          }
        })
      }
      latch.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(got.size() === 2, "both racing committers must land")
      assert(got.contains(6L) && got.contains(7L))
    } finally hc.unset(ColeCommitPrimitives.ConfKey)
  }
}
