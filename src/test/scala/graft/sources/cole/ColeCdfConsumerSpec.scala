package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Consumer-registered retention watermarks (r11): the stretch half of
  * the retention guard — instead of hand-sizing
  * `keep_last_versions` to presumed consumer lag, a CDF stream opened
  * with the `consumerId` option advances a durable low-watermark on
  * every committed micro-batch, and `expire_versions` never expires a
  * version ABOVE the slowest registered consumer. Operations surface:
  * `CALL cole.system.cdf_consumers('ns.t')` lists registrations,
  * `unregister_cdf_consumer` releases a decommissioned pipeline's pin.
  */
class ColeCdfConsumerSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_cons_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.cons", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cons.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** v1 baseline, v2 delete, v3 append, v4 delete. */
  private def history(name: String): String = {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/$name"
    (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    s.sql(s"CALL cons.system.versioning('db.$name')")
    s.sql(s"CALL cons.system.delete_mode('db.$name', 'vector')")
    s.sql(s"DELETE FROM cons.db.$name WHERE k < 10") // v2
    (500 until 510).map(i => (i.toLong, 1L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(t) // v3
    s.sql(s"DELETE FROM cons.db.$name WHERE k >= 505") // v4
    t
  }

  private def drain(t: String, cp: String, id: String): Long = {
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .option("consumerId", id)
      .option("maxCommitsPerTrigger", "1")
      .load(t)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          n.addAndGet(b.count()); ()
      }
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()
    n.get()
  }

  test("a consumerId stream registers and advances its watermark per committed batch") {
    val t = history("reg")
    val cp = Files.createTempDirectory("cole_cons_cp").toString
    assert(drain(t, cp, "etl-1") > 0)
    // Spark's micro-batch protocol commits batch N to the source when
    // batch N+1 is constructed, so the registered LOW-watermark trails
    // the in-flight batch by one — conservative, never overshoots
    val w1 = ColeVersions.consumerWatermarks(t, conf)("etl-1")
    assert(w1 >= 3L && w1 <= 4L, s"watermark $w1")
    val listed = spark.sql("CALL cons.system.cdf_consumers('db.reg')").collect()
    assert(listed.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("etl-1", w1)))
    // more commits, resume from the checkpoint: the watermark advances
    spark.sql("DELETE FROM cons.db.reg WHERE k >= 90 AND k < 100") // v5
    drain(t, cp, "etl-1")
    val w2 = ColeVersions.consumerWatermarks(t, conf)("etl-1")
    assert(w2 >= 4L && w2 > w1 - 1, s"watermark $w1 -> $w2")
  }

  test("expire_versions never expires above the slowest registered consumer; unregister releases the pin") {
    val t = history("pin")
    // a consumer that has only durably processed v1
    ColeVersions.registerConsumer(t, conf, "laggard", 1L)
    // an aggressive cron: everything older than 0 hours, NO keep_last
    val expired1 = spark.sql(
      "CALL cons.system.expire_versions('db.pin', 0, 0)").collect()(0).getLong(0)
    // only v1 (at or below the watermark) was touchable
    assert(ColeVersions.expiryHorizon(t, conf) == 1L)
    val hist = spark.sql(
      "SELECT version, expired FROM cons.db.`pin$history` ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(hist == Seq((1L, true), (2L, false), (3L, false), (4L, false)))
    // the laggard's unread range (v2..v4] still serves
    assert(ColeChangeFeed.read(spark, t, 1L, 4L).count() > 0)
    // pipeline decommissioned: unregister, expire again — the pin is gone
    val existed = spark.sql(
      "CALL cons.system.unregister_cdf_consumer('db.pin', 'laggard')")
      .collect()(0).getBoolean(0)
    assert(existed)
    spark.sql("CALL cons.system.expire_versions('db.pin', 0, 0)").collect()
    assert(ColeVersions.expiryHorizon(t, conf) == 4L)
    assert(expired1 >= 0) // shape pin: procedure returns a count
  }

  test("watermarks are monotonic and ids validate") {
    val t = history("mono")
    ColeVersions.registerConsumer(t, conf, "c1", 3L)
    ColeVersions.registerConsumer(t, conf, "c1", 2L) // replay must not regress
    assert(ColeVersions.consumerWatermarks(t, conf)("c1") == 3L)
    intercept[IllegalArgumentException] {
      ColeVersions.registerConsumer(t, conf, "bad/id", 1L)
    }
    assert(!ColeVersions.unregisterConsumer(t, conf, "never-registered"))
  }
}
