package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Versioned clones (r15, verdict ask #4): a zero-copy clone can enable
  * versioning on its LOCAL commit stream before localize. The baseline
  * records the foreign half (resolved through the pointer until
  * localize); a clone-DML replacement COPY-retires the foreign file's
  * bytes under the clone's own log, so every remove token is an
  * ordinary retired path and the whole version surface — time travel,
  * rollback, the change feed, audit — works over clone DML with the
  * standard machinery. Pinned here:
  *   - time travel across clone DML: the pre-UPDATE snapshot reads the
  *     original foreign rows while live reads serve the replacement;
  *   - rollback of a clone-local commit restores masked-foreign
  *     visibility (fold-driven — no bytes move at the source) and the
  *     rolled-over version stays readable;
  *   - localize preserves the version history: pre-localize snapshots
  *     (incl. pre-DML ones) stay readable after graduation;
  *   - the source is untouched byte-for-byte throughout;
  *   - the change feed serves clone DML delta-exactly.
  */
class ColeCloneVersionsSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_clv_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.clv", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.clv.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def mkClone(src: String, dst: String, n: Int = 60): (String, String) = {
    val s = spark
    import s.implicits._
    val sdir = s"$warehouse/db/$src"
    (0 until n).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "g", "s")
      .coalesce(2).write.format("cole").mode("overwrite").save(sdir)
    spark.sql(s"CALL clv.system.versioning('db.$src')")
    spark.sql(s"CALL clv.system.clone('db.$src', 'db.$dst')")
    (sdir, s"$warehouse/db/$dst")
  }

  private def fileState(t: String): Map[String, (Long, Long)] =
    ColeIO.listPartitioned(t, conf).map { case (st, _) =>
      st.getPath.toString -> (st.getLen, st.getModificationTime)
    }.toMap

  test("time travel across clone DML: pre-UPDATE snapshot readable, live serves the replacement") {
    val (sdir, cdir) = mkClone("s1", "c1")
    val srcBefore = fileState(sdir)
    spark.sql("CALL clv.system.versioning('db.c1')") // v1: foreign baseline
    assert(spark.read.format("cole").option("versionAsOf", "1").load(cdir)
      .count() === 60L, "the baseline must cover the foreign half")
    // v2: a local append; v3: DML over FOREIGN rows
    val s = spark
    import s.implicits._
    (100 until 110).map(i => (i.toLong, 9, s"n$i")).toDF("id", "g", "s")
      .coalesce(1).write.format("cole").mode("append").save(cdir)
    spark.sql("UPDATE clv.db.c1 SET s = 'X' WHERE id < 5")
    // live: replacement visible
    val live = spark.table("clv.db.c1")
    assert(live.count() === 70L)
    assert(live.filter(col("s") === "X").count() === 5L)
    // v1: original foreign rows, no append
    val v1 = spark.read.format("cole").option("versionAsOf", "1").load(cdir)
    assert(v1.count() === 60L && v1.filter(col("s") === "X").count() === 0L)
    assert(v1.filter(col("id") === 0).head().getString(2) === "v0")
    // v2: append visible, DML not yet
    val v2 = spark.read.format("cole").option("versionAsOf", "2").load(cdir)
    assert(v2.count() === 70L && v2.filter(col("s") === "X").count() === 0L)
    // the SOURCE is untouched byte-for-byte
    assert(fileState(sdir) === srcBefore)
    assert(spark.table("clv.db.s1").filter(col("s") === "X").count() === 0L)
    // audit: clean (foreign rels attested through the pointer)
    val (missing, unlogged) = ColeVersions.audit(cdir, conf)
    assert(missing.isEmpty && unlogged.isEmpty,
      s"audit drift on a versioned clone: missing=$missing unlogged=$unlogged")
  }

  test("rollback of a clone-local DML restores masked-foreign visibility") {
    val (sdir, cdir) = mkClone("s2", "c2")
    spark.sql("CALL clv.system.versioning('db.c2')") // v1
    spark.sql("UPDATE clv.db.c2 SET s = 'X' WHERE id < 5") // v2
    spark.sql("DELETE FROM clv.db.c2 WHERE id >= 55") // v3
    assert(spark.table("clv.db.c2").count() === 55L)
    spark.sql("CALL clv.system.rollback('db.c2', 1)") // v4 = v1 content
    val live = spark.table("clv.db.c2")
    assert(live.count() === 60L, "rollback must restore the masked foreign rows")
    assert(live.filter(col("s") === "X").count() === 0L)
    assert(live.filter(col("id") === 0).head().getString(2) === "v0")
    // the rolled-over version stays readable
    val v2 = spark.read.format("cole").option("versionAsOf", "2").load(cdir)
    assert(v2.filter(col("s") === "X").count() === 5L)
    // the source never moved a byte (still serves everything)
    assert(spark.table("clv.db.s2").count() === 60L)
    // and DML WORKS AGAIN after the rollback (fresh masks over restored rels)
    spark.sql("UPDATE clv.db.c2 SET s = 'Y' WHERE id = 1")
    assert(spark.table("clv.db.c2").filter(col("s") === "Y").count() === 1L)
  }

  test("localize preserves the version history") {
    val (sdir, cdir) = mkClone("s3", "c3")
    spark.sql("CALL clv.system.versioning('db.c3')") // v1
    spark.sql("UPDATE clv.db.c3 SET s = 'X' WHERE id < 5") // v2
    val liveBefore = spark.table("clv.db.c3").orderBy("id").collect().toSeq
    spark.sql("CALL clv.system.localize('db.c3')")
    assert(ColeClone.read(cdir, conf).isEmpty, "localize must graduate")
    // live content unchanged by graduation
    assert(spark.table("clv.db.c3").orderBy("id").collect().toSeq ===
      liveBefore)
    // pre-localize snapshots still read: v1 = originals (the DML'd
    // foreign file resolves at its copy-retired bytes), v2 = updated
    val v1 = spark.read.format("cole").option("versionAsOf", "1").load(cdir)
    assert(v1.count() === 60L && v1.filter(col("s") === "X").count() === 0L)
    val v2 = spark.read.format("cole").option("versionAsOf", "2").load(cdir)
    assert(v2.filter(col("s") === "X").count() === 5L)
    // history continues normally on the now-plain table
    spark.sql("DELETE FROM clv.db.c3 WHERE id = 0")
    assert(spark.table("clv.db.c3").count() === 59L)
    assert(spark.read.format("cole").option("versionAsOf", "2").load(cdir)
      .count() === 60L)
  }

  test("the change feed serves clone DML delta-exactly") {
    val (_, cdir) = mkClone("s4", "c4")
    spark.sql("CALL clv.system.versioning('db.c4')") // v1
    spark.sql("UPDATE clv.db.c4 SET s = 'X' WHERE id = 7") // v2
    val feed = ColeChangeFeed.read(spark, cdir, 1, 2)
    val byType = feed.groupBy(ColeChangeFeed.ChangeTypeCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // one foreign file replaced: its surviving rows re-land as inserts,
    // its old rows as deletes — the DML'd row differs between the sides
    val dels = feed.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
    val ins = feed.filter(col(ColeChangeFeed.ChangeTypeCol) === "insert")
    assert(byType("delete") === byType("insert"),
      "a pure update commit must balance deletes and inserts")
    assert(dels.filter(col("id") === 7).head().getString(2) === "v7")
    assert(ins.filter(col("id") === 7).head().getString(2) === "X")
  }
}
