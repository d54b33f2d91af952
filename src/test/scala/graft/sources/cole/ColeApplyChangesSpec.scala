package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `ColeCdfStream.applyChanges` — one-call CDF-to-table replication.
  *
  * Pins: (1) replaying a mutating history (baseline + vector DELETE +
  * append + MOR MERGE) into a downstream COLE table reproduces the
  * source exactly at HEAD; (2) exactly-once under micro-batch replay —
  * re-applying an already-applied batch is a no-op through the
  * `_commit_version` watermark, and a kill+restart from the checkpoint
  * (which re-delivers the in-flight batch) converges to the same bytes;
  * (3) the crash window between MERGE and watermark advance also
  * converges (the re-MERGE is row-for-row idempotent).
  */
class ColeApplyChangesSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_apply_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.aw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.aw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** id 0..999, v=0; versioned from birth; vector delete mode. */
  private def sourceTable(name: String): String = {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/$name"
    (0 until 1000).map(i => (i.toLong, 0L, s"t$i")).toDF("id", "v", "tag")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1 = baseline
    ColeDv.setMode(t, conf, "vector")
    t
  }

  private def mutate(name: String): Unit = {
    val s = spark
    import s.implicits._
    s.sql(s"DELETE FROM aw.db.$name WHERE id % 10 = 3") // v2: MOR delete
    (1000 until 1100).map(i => (i.toLong, 7L, s"n$i")).toDF("id", "v", "tag")
      .coalesce(1).write.format("cole").mode("append")
      .save(s"$warehouse/db/$name") // v3: append
    (0 until 1200 by 4).map(i => (i.toLong, 100L)).toDF("k", "nv")
      .createOrReplaceTempView(s"${name}_src")
    s.sql(s"""MERGE INTO aw.db.$name t USING ${name}_src x ON t.id = x.k
      WHEN MATCHED THEN UPDATE SET v = t.v + x.nv
      WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (x.k, x.nv, 'm')
      """) // v4: MOR update+insert
  }

  private def createTarget(name: String): Unit =
    spark.sql(s"CREATE TABLE aw.db.$name (id BIGINT, v BIGINT, tag STRING)")

  private def contents(table: String): Set[Seq[Any]] =
    spark.table(table).collect().map(_.toSeq).toSet

  test("full-history replication: target equals source at HEAD") {
    val src = sourceTable("s1")
    mutate("s1")
    createTarget("t1")
    val cp = Files.createTempDirectory("apply_cp1").toString
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .load(src)
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        ColeCdfStream.applyChanges(b, "aw.db.t1", Seq("id")); ()
      }.option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()
    assert(contents("aw.db.t1") === contents("aw.db.s1"))
    assert(ColeCdfStream.appliedWatermark(s"$warehouse/db/t1", conf,
      "default") === ColeVersions.currentVersion(src, conf))
  }

  test("exactly-once: a replayed batch is a watermark no-op; restart converges") {
    val src = sourceTable("s2")
    createTarget("t2")
    val cp = Files.createTempDirectory("apply_cp2").toString
    def run(): Unit = {
      val q = spark.readStream.format("cole").option("changeFeed", "true")
        .load(src)
        .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
          ColeCdfStream.applyChanges(b, "aw.db.t2", Seq("id")); ()
        }.option("checkpointLocation", cp).start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // replicates the baseline
    assert(contents("aw.db.t2") === contents("aw.db.s2"))
    // manual replay of an already-applied range: the watermark filters
    // everything, the MERGE never runs, the table is untouched
    val cur = ColeVersions.currentVersion(src, conf)
    val replay = ColeChangeFeed.read(spark, src, 0L, cur)
    val before = contents("aw.db.t2")
    val wm = ColeCdfStream.applyChanges(replay, "aw.db.t2", Seq("id"))
    assert(wm === cur, "watermark must be unchanged by a full replay")
    assert(contents("aw.db.t2") === before)
    // kill + restart: mutate more, run a FRESH query from the same
    // checkpoint — only the new commits apply, and the target converges
    mutate("s2")
    run()
    assert(contents("aw.db.t2") === contents("aw.db.s2"))
  }

  test("crash between MERGE and watermark advance: re-applied batch converges") {
    val src = sourceTable("s3")
    mutate("s3")
    createTarget("t3")
    val cur = ColeVersions.currentVersion(src, conf)
    val feed = ColeChangeFeed.read(spark, src, 0L, cur)
    ColeCdfStream.applyChanges(feed, "aw.db.t3", Seq("id"))
    assert(contents("aw.db.t3") === contents("aw.db.s3"))
    // simulate the crash window: roll the watermark back by hand (as if
    // the MERGE landed but the advance didn't), then re-apply the same
    // batch — the re-MERGE must be row-for-row idempotent
    val tPath = s"$warehouse/db/t3"
    val (fs, _) = ColeIO.resolve(tPath, conf)
    fs.delete(new org.apache.hadoop.fs.Path(tPath, "_cole_applied"), true)
    assert(ColeCdfStream.appliedWatermark(tPath, conf, "default") === 0L)
    ColeCdfStream.applyChanges(feed, "aw.db.t3", Seq("id"))
    assert(contents("aw.db.t3") === contents("aw.db.s3"),
      "re-applying the full batch after a lost watermark must converge")
    assert(ColeCdfStream.appliedWatermark(tPath, conf, "default") === cur)
  }

  test("within-batch collapse: delete then re-insert of a key keeps only the last action") {
    val s = spark
    import s.implicits._
    val src = sourceTable("s4")
    s.sql(s"DELETE FROM aw.db.s4 WHERE id = 5") // v2
    Seq((5L, 42L, "back")).toDF("id", "v", "tag")
      .coalesce(1).write.format("cole").mode("append")
      .save(src) // v3: the key returns with new values
    s.sql(s"DELETE FROM aw.db.s4 WHERE id = 6") // v4: plain delete
    createTarget("t4")
    val cur = ColeVersions.currentVersion(src, conf)
    ColeCdfStream.applyChanges(
      ColeChangeFeed.read(spark, src, 0L, cur), "aw.db.t4", Seq("id"))
    assert(contents("aw.db.t4") === contents("aw.db.s4"))
    val r5 = spark.table("aw.db.t4").filter(col("id") === 5).collect()
    assert(r5.length === 1 && r5.head.getLong(1) === 42L)
    assert(spark.table("aw.db.t4").filter(col("id") === 6).isEmpty)
  }
}
