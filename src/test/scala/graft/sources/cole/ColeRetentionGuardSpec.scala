package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retention versus live CDF consumers (r11):
  *
  *   - `expire_versions('ns.t', hours, keep_last_versions)` takes a
  *     FLOOR — the most recent keep_last_versions never expire
  *     regardless of age, so maintenance sized to consumer lag cannot
  *     expire a lagging stream's unread range out from under it;
  *   - every vacuum run advances an expiry-horizon marker; `$history`
  *     surfaces it per row as `expired`, making "earliest un-expired
  *     version" one SQL aggregate away;
  *   - the CDF stream and the batch feed REFUSE expired starting points
  *     up front, naming the earliest un-expired version — never a
  *     missing-file error from deep inside a read.
  */
class ColeRetentionGuardSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_ret_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.ret", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.ret.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** v1 baseline, v2 delete, v3 append, v4 delete — all immediately
    * "old" for a 0-hour TTL.
    */
  private def history(name: String): String = {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/$name"
    (0 until 200).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    s.sql(s"CALL ret.system.versioning('db.$name')")
    s.sql(s"CALL ret.system.delete_mode('db.$name', 'vector')")
    s.sql(s"DELETE FROM ret.db.$name WHERE k < 20") // v2
    (500 until 520).map(i => (i.toLong, 1L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v3
    s.sql(s"DELETE FROM ret.db.$name WHERE k >= 510") // v4
    t
  }

  test("keep_last_versions floor: a lagging stream's range survives expiry and the stream resumes green") {
    val t = history("floor")
    // a consumer lagging at v1 (has consumed nothing past the baseline)
    val cp = Files.createTempDirectory("cole_ret_cp").toString
    val received = new java.util.concurrent.atomic.AtomicLong(0)
    def run(): Unit = {
      // foreachBatch: the one sink that supports checkpoint RECOVERY
      val q = spark.readStream.format("cole").option("changeFeed", "true")
        .option("maxCommitsPerTrigger", "2")
        .load(t)
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            received.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
    }
    // first run consumes v1-v4, then the query stops (now lagging)
    run()
    val consumed = received.get()
    assert(consumed > 0)
    val s = spark
    import s.implicits._
    (600 until 620).map(i => (i.toLong, 2L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v5 (unread)
    s.sql("DELETE FROM ret.db.floor WHERE k = 600") // v6 (unread)
    // maintenance with a floor covering the consumer's lag: everything
    // is "old" (0-hour TTL) but the last 4 versions may not expire
    s.sql("CALL ret.system.expire_versions('db.floor', 0, 4)")
    assert(ColeVersions.expiryHorizon(t, conf) === 2L,
      "horizon must stop below the keep_last_versions floor")
    // the lagging stream resumes from its checkpoint and drains green
    run()
    assert(received.get() > consumed,
      "resumed stream served the unread commits")
  }

  test("expiry horizon: feed and stream refuse expired ranges up front, naming the earliest un-expired version") {
    val t = history("guard")
    spark.sql("CALL ret.system.expire_versions('db.guard', 0, 2)")
    val horizon = ColeVersions.expiryHorizon(t, conf)
    assert(horizon === 2L)
    // batch feed from an expired start: loud, actionable, up-front
    val e1 = intercept[IllegalArgumentException] {
      ColeChangeFeed.read(spark, t, 1L, 4L)
    }
    assert(e1.getMessage.contains(s"earliest un-expired version is v3"))
    // stream with an expired startingVersion: same refusal at start
    val cp = Files.createTempDirectory("cole_ret_cp2").toString
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("cole").option("changeFeed", "true")
        .option("startingVersion", "2").load(t)
        .writeStream.format("memory").queryName("ret_guard_sink")
        .option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
    }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Seq.empty else Seq(Option(x.getMessage).getOrElse("")) ++ chain(x.getCause)
    assert(chain(e2).exists(_.contains("earliest un-expired version is v3")),
      s"stream refusal missing the safe floor: ${e2.getMessage}")
    // un-expired start still serves
    assert(ColeChangeFeed.read(spark, t, 2L, 4L).count() > 0)
  }

  test("$history surfaces expiry per version; earliest un-expired is one aggregate away") {
    val t = history("hist")
    spark.sql("CALL ret.system.expire_versions('db.hist', 0, 2)")
    val h = spark.sql("SELECT version, expired FROM ret.db.`hist$history` ORDER BY version")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toSeq
    assert(h === Seq(1L -> true, 2L -> true, 3L -> false, 4L -> false))
    val earliest = spark.sql(
      "SELECT MIN(version) FROM ret.db.`hist$history` WHERE NOT expired")
      .head.getLong(0)
    assert(earliest === 3L)
    assert(ColeVersions.expiryHorizon(t, conf) === 2L)
  }
}
