package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Atomic CTAS / RTAS ([[ColeStagedTable]]): `CREATE TABLE AS SELECT`
  * materializes in a dotted staging directory and renames into place at
  * commit — a failed CTAS never leaves a half-written visible table, and
  * `REPLACE TABLE AS SELECT` swaps old for new without ever exposing an
  * intermediate empty table.
  */
class ColeCtasSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_ctas_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.cts", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cts.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS cts.db")
    s
  }

  private def listDb(): Seq[String] =
    spark.sql("SHOW TABLES IN cts.db").collect().map(_.getString(1)).toSeq

  test("CTAS lands atomically with no staging leftovers") {
    spark.sql("CREATE TABLE cts.db.t1 AS " +
      "SELECT id, id % 7 AS k, CAST(id AS DOUBLE) * 0.5 AS v FROM range(0, 10000)")
    assert(spark.table("cts.db.t1").count() === 10000)
    assert(spark.table("cts.db.t1").agg(sum("k")).head().getLong(0) ===
      (0 until 10000).map(_ % 7).sum.toLong)
    // no dotted scratch left beside the table, nothing extra listed
    val ns = new java.io.File(s"$warehouse/db")
    assert(!ns.listFiles().exists(_.getName.contains("staging")),
      "staging directory must be gone after commit")
    assert(listDb().contains("t1"))
  }

  test("failed CTAS leaves no visible table and no scratch") {
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE cts.db.boom AS " +
        "SELECT id, assert_true(id < 100, 'synthetic failure') AS x " +
        "FROM range(0, 10000)")
    }
    assert(e.getMessage != null)
    assert(!listDb().contains("boom"), "failed CTAS must not surface a table")
    intercept[Exception] { spark.table("cts.db.boom").count() }
    val ns = new java.io.File(s"$warehouse/db")
    assert(!ns.listFiles().exists(_.getName.contains("staging")),
      "aborted staging directory must be deleted")
  }

  test("RTAS swaps content atomically; REPLACE of a missing table is loud") {
    spark.sql("CREATE TABLE cts.db.r1 AS SELECT id FROM range(0, 100)")
    spark.sql("REPLACE TABLE cts.db.r1 AS " +
      "SELECT id, id * 2 AS dbl FROM range(0, 50)")
    val t = spark.table("cts.db.r1")
    assert(t.count() === 50)
    assert(t.schema.fieldNames.toSeq === Seq("id", "dbl"))
    // old directory is fully retired (no tombstone, no stale files)
    val ns = new java.io.File(s"$warehouse/db")
    assert(!ns.listFiles().exists(f => f.getName.contains("replaced") ||
      f.getName.contains("staging")))
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE cts.db.never_was AS SELECT id FROM range(3)")
    }
    assert(e.getMessage.toLowerCase.contains("table") ||
      e.getMessage.toLowerCase.contains("not found"))
  }

  test("CREATE OR REPLACE creates when missing and replaces when present") {
    spark.sql("CREATE OR REPLACE TABLE cts.db.cr AS SELECT id FROM range(0, 7)")
    assert(spark.table("cts.db.cr").count() === 7)
    spark.sql("CREATE OR REPLACE TABLE cts.db.cr AS " +
      "SELECT id, 'x' AS tag FROM range(0, 3)")
    assert(spark.table("cts.db.cr").count() === 3)
    assert(spark.table("cts.db.cr").schema.fieldNames.contains("tag"))
  }

  test("CTAS with layout: buckets and versioning ride the rename") {
    spark.sql("CREATE TABLE cts.db.bt PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('versioned'='true') AS " +
      "SELECT id % 100 AS k, id AS v FROM range(0, 5000)")
    val path = s"$warehouse/db/bt"
    assert(ColeBucket.readSpec(path, ColeIO.driverConf()) === Some((4, Seq("k"))))
    assert(ColeVersions.enabled(path, ColeIO.driverConf()),
      "versioning declared at CTAS must survive the rename")
    assert(spark.table("cts.db.bt").agg(sum("v")).head().getLong(0) ===
      (0L until 5000L).sum)
    // bucket layout actually routed: bucket dirs exist
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("_bucket="))
    assert(dirs.length === 4)
  }

  test("CTAS into an existing table rejects at stage time") {
    spark.sql("CREATE TABLE cts.db.dup AS SELECT id FROM range(2)")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE cts.db.dup AS SELECT id FROM range(5)")
    }
    assert(e.getMessage.toLowerCase.contains("exists") ||
      e.getMessage.toLowerCase.contains("already"))
    assert(spark.table("cts.db.dup").count() === 2, "loser must not clobber")
  }

  test("a CTAS'd table composes with column DEFAULT evolution") {
    spark.sql("CREATE TABLE cts.db.dt AS SELECT id FROM range(0, 4)")
    spark.sql("ALTER TABLE cts.db.dt ADD COLUMN tier STRING DEFAULT 'std'")
    spark.sql("INSERT INTO cts.db.dt VALUES (4, 'gold')")
    val got = spark.table("cts.db.dt").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((0L, "std"), (1L, "std"), (2L, "std"),
      (3L, "std"), (4L, "gold")))
  }
}
