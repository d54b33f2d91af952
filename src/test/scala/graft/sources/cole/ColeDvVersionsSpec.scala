package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Versioned deletion vectors (r10): vector mode and snapshot versioning
  * COMPOSE. Every vector commit (DELETE fast path, delta UPDATE/MERGE)
  * pins an immutable copy of each extended sidecar under
  * `_cole_versions/dv/<stamp>/` and records `dv:` entries, so:
  *   - time travel resolves each file's vector AS OF the version
  *     (pre-delete snapshots still see the rows, post-delete ones don't);
  *   - the row-level change feed serves vector commits DELTA-EXACTLY
  *     from the ordinals themselves — no exceptAll diff;
  *   - rollback restores vector state (un-deletes), as a new commit;
  *   - vacuum expires only SUPERSEDED pins, and an expired version fails
  *     loudly, never resurrects or partially reads;
  *   - the plain insert feed refuses dv-bearing commits by record shape;
  *   - a tailing stream refuses vector-mode tables loudly.
  */
class ColeDvVersionsSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_dvv_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.dvv", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.dvv.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def asOf(dir: String, v: Long): DataFrame =
    spark.read.format("cole").option("versionAsOf", v.toString).load(dir)

  test("time travel across a vector DELETE: pinned vectors resolve per version") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/tt"
    (0 until 2000).map(i => (i.toLong, (i % 5).toLong)).toDF("k", "g")
      .coalesce(2).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "256").save(t)
    spark.sql("CALL dvv.system.versioning('db.tt')") // v1 baseline
    spark.sql("CALL dvv.system.delete_mode('db.tt', 'vector')")
    spark.sql("DELETE FROM dvv.db.tt WHERE k >= 500 AND k < 800") // v2
    spark.sql("DELETE FROM dvv.db.tt WHERE k >= 1900")            // v3
    assert(spark.table("dvv.db.tt").count() === 1600L)
    // v1: everything; v2: first delete only; v3: both
    assert(asOf(t, 1).count() === 2000L)
    assert(asOf(t, 2).count() === 1700L)
    assert(asOf(t, 2).filter(col("k") === 600L).count() === 0L)
    assert(asOf(t, 2).filter(col("k") === 1950L).count() === 1L)
    assert(asOf(t, 3).count() === 1600L)
    // aggregate pushdown works on the PINNED snapshot too, vector-masked
    val agg = asOf(t, 2).agg(sum("k").as("s"), max("k").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "pinned vector snapshot must keep aggregate pushdown")
    assert(agg.head.getLong(0) ===
      (0L until 2000L).filterNot(k => k >= 500 && k < 800).sum)
    assert(agg.head.getLong(1) === 1999L)
    // SQL time travel through the catalog agrees
    assert(spark.sql("SELECT count(*) FROM dvv.db.tt VERSION AS OF 2")
      .head.getLong(0) === 1700L)
  }

  test("enabling versioning ON a table with live vectors pins them in the baseline") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/en"
    (0 until 600).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvv.system.delete_mode('db.en', 'vector')")
    spark.sql("DELETE FROM dvv.db.en WHERE k < 100") // unversioned vector
    spark.sql("CALL dvv.system.versioning('db.en')") // v1 pins the sidecar
    spark.sql("DELETE FROM dvv.db.en WHERE k < 200") // v2
    assert(spark.table("dvv.db.en").count() === 400L)
    assert(asOf(t, 1).count() === 500L, "baseline must pin the pre-existing vector")
    assert(asOf(t, 1).agg(min("k")).head.getLong(0) === 100L)
    assert(asOf(t, 2).agg(min("k")).head.getLong(0) === 200L)
  }

  test("change feed serves vector DELETE commits delta-exactly") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/cf"
    (0 until 1000).map(i => (i.toLong, s"r$i")).toDF("k", "tag").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvv.system.versioning('db.cf')") // v1
    spark.sql("CALL dvv.system.delete_mode('db.cf', 'vector')")
    spark.sql("DELETE FROM dvv.db.cf WHERE k >= 100 AND k < 130") // v2
    spark.sql("DELETE FROM dvv.db.cf WHERE k >= 120 AND k < 160") // v3 (overlap)
    val feed = ColeChangeFeed.read(spark, t, 1L, 3L)
    val dels = feed.filter(col("_change_type") === "delete")
    // v2 deletes exactly [100,130); v3 exactly [130,160) — the overlap
    // [120,130) must NOT re-emit (already in v2's vector)
    assert(dels.filter(col("_commit_version") === 2L).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq === (100L until 130L))
    assert(dels.filter(col("_commit_version") === 3L).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq === (130L until 160L))
    assert(feed.filter(col("_change_type") === "insert").count() === 0L)
    // and the plain INSERT feed refuses the dv-bearing range by shape
    val e = intercept[Exception] {
      spark.read.format("cole").option("changesFrom", "1")
        .option("changesTo", "3").load(t).count()
    }
    assert(e.getMessage.contains("row-removing"))
  }

  test("change feed over a merge-on-read MERGE: reconstruction contract holds") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/mor"
    (0 until 500).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvv.system.versioning('db.mor')") // v1
    spark.sql("CALL dvv.system.delete_mode('db.mor', 'vector')")
    (400 until 520).map(i => (i.toLong, i.toLong + 10000)).toDF("k", "v")
      .createOrReplaceTempView("mor_src")
    // delta MERGE: updates [400,500) in place-by-vector, inserts [500,520)
    spark.sql("""MERGE INTO dvv.db.mor t USING mor_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""") // v2
    val feed = ColeChangeFeed.read(spark, t, 1L, 2L)
    val dels = feed.filter(col("_change_type") === "delete")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ins = feed.filter(col("_change_type") === "insert")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dels === (400 until 500).map(i => (i.toLong, i.toLong)).toSet,
      "deletes must be exactly the updated rows' OLD images")
    assert(ins === (400 until 520).map(i => (i.toLong, i.toLong + 10000)).toSet,
      "inserts must be the new images plus the genuine inserts")
    // T(1) - deletes + inserts = T(2)
    val t1 = asOf(t, 1).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val t2 = asOf(t, 2).select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((t1 -- dels) ++ ins === t2)
    assert(t2 === spark.table("dvv.db.mor").select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("rollback restores vector state: un-deletes, as a new commit") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rb"
    (0 until 800).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvv.system.versioning('db.rb')") // v1
    spark.sql("CALL dvv.system.delete_mode('db.rb', 'vector')")
    spark.sql("DELETE FROM dvv.db.rb WHERE k < 300") // v2
    assert(spark.table("dvv.db.rb").count() === 500L)
    ColeVersions.rollback(t, conf, 1L) // v3 = v1 content
    assert(spark.table("dvv.db.rb").count() === 800L,
      "rollback to the pre-delete version must un-delete (clear the vector)")
    assert(spark.table("dvv.db.rb").agg(min("k")).head.getLong(0) === 0L)
    // rolled-over versions stay readable with THEIR vector state
    assert(asOf(t, 2).count() === 500L)
    // and rolling FORWARD to the deleted state works too
    ColeVersions.rollback(t, conf, 2L) // v4 = v2 content
    assert(spark.table("dvv.db.rb").count() === 500L)
    assert(spark.table("dvv.db.rb").agg(min("k")).head.getLong(0) === 300L)
  }

  test("COW rewrite of a vectored file: feed masks prior-version ordinals") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/cow"
    (0 until 400).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvv.system.versioning('db.cow')") // v1
    spark.sql("CALL dvv.system.delete_mode('db.cow', 'vector')")
    spark.sql("DELETE FROM dvv.db.cow WHERE k < 50") // v2 (vector)
    // compaction materializes the vector: a removing commit over a
    // vectored file — the feed must treat it as row-preserving (compact)
    ColeCompact.compact(s, t, 512L << 20) // v3
    assert(spark.table("dvv.db.cow").count() === 350L)
    spark.sql("DELETE FROM dvv.db.cow WHERE k >= 390") // v4 (fresh vector)
    val feed = ColeChangeFeed.read(spark, t, 3L, 4L)
    assert(feed.filter(col("_change_type") === "delete").select("k")
      .collect().map(_.getLong(0)).sorted.toSeq === (390L until 400L),
      "post-compaction vector DELETE must feed exactly its own rows")
    // snapshots around the compaction stay consistent
    assert(asOf(t, 2).count() === 350L)
    assert(asOf(t, 3).count() === 350L)
    assert(asOf(t, 4).count() === 340L)
  }

  test("vacuum expires only superseded pins; expired versions fail loudly") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/vx"
    (0 until 300).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvv.system.versioning('db.vx')") // v1
    spark.sql("CALL dvv.system.delete_mode('db.vx', 'vector')")
    spark.sql("DELETE FROM dvv.db.vx WHERE k < 100") // v2 (pin A)
    spark.sql("DELETE FROM dvv.db.vx WHERE k < 150") // v3 (pin B supersedes A)
    // TTL 0: everything older than "now" is expirable — pin A is
    // superseded (by v3) and goes; pin B backs the CURRENT state and the
    // v3 snapshot, and must survive
    ColeVersions.vacuumRetired(t, conf, 0L)
    assert(spark.table("dvv.db.vx").count() === 150L)
    assert(asOf(t, 3).count() === 150L, "current vector state must survive vacuum")
    val e = intercept[Exception] { asOf(t, 2).count() }
    assert(e.getMessage.contains("no longer reconstructible"),
      s"expired pinned vector must fail loudly, got: ${e.getMessage}")
  }

  test("tailing stream refuses a vector-mode table loudly") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/st"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvv.system.delete_mode('db.st', 'vector')")
    val cp = Files.createTempDirectory("cole_dvv_st_cp").toString
    val q = s.readStream.format("cole").load(t)
      .writeStream.format("memory").queryName("dvv_st_out")
      .option("checkpointLocation", cp)
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(10000)
    }
    def rootMsg(e: Throwable): String =
      if (e.getCause == null) e.getMessage else e.getMessage + rootMsg(e.getCause)
    assert(rootMsg(err).contains("delete_mode is 'vector'"),
      "stream must refuse vector-mode tables with an actionable message")
  }
}
