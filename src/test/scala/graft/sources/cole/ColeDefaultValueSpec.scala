package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column DEFAULT values ([[ColeDefaults]]) — the ANSI `DEFAULT` story.
  *
  * Contract: CURRENT default (INSERT-side) resolves in Spark's analyzer
  * via the catalog capability; EXISTS default (read-side) is folded at
  * `ADD COLUMN ... DEFAULT` time, immutable afterwards, and fills the
  * column for rows written before it existed — identically on every read
  * surface (batch scan, filters, aggregates, DML rewrites). `SET DEFAULT`
  * moves only the INSERT side. Pushdown stays exact by declining on
  * defaulted columns absent from some planned file.
  */
class ColeDefaultValueSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_default_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.dfw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.dfw.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS dfw.db")
    s
  }

  test("CREATE TABLE with DEFAULT: INSERT subsets and the DEFAULT keyword") {
    spark.sql("CREATE TABLE dfw.db.c1 (id BIGINT, tier STRING DEFAULT 'std', " +
      "qty INT DEFAULT 7)")
    spark.sql("INSERT INTO dfw.db.c1 (id) VALUES (1), (2)")
    spark.sql("INSERT INTO dfw.db.c1 VALUES (3, 'gold', DEFAULT)")
    spark.sql("INSERT INTO dfw.db.c1 VALUES (4, 'silver', 9)")
    val got = spark.table("dfw.db.c1").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got === Seq((1L, "std", 7), (2L, "std", 7),
      (3L, "gold", 7), (4L, "silver", 9)))
  }

  test("ADD COLUMN ... DEFAULT fills pre-existing rows on read") {
    spark.sql("CREATE TABLE dfw.db.e1 (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO dfw.db.e1 SELECT id, id * 0.5 FROM range(0, 1000)")
    spark.sql("ALTER TABLE dfw.db.e1 ADD COLUMN tier STRING DEFAULT 'std'")
    spark.sql("ALTER TABLE dfw.db.e1 ADD COLUMN bonus INT DEFAULT 3")
    // pre-evolution rows read the default, not NULL — both readers
    val t = spark.table("dfw.db.e1")
    assert(t.filter(col("tier").isNull).count() === 0)
    assert(t.filter(col("tier") === "std").count() === 1000)
    assert(t.agg(sum("bonus")).head().getLong(0) === 3000L)
    // new INSERT without the columns writes the current default
    spark.sql("INSERT INTO dfw.db.e1 (id, v) VALUES (1000, 1.0)")
    // explicit values win
    spark.sql("INSERT INTO dfw.db.e1 VALUES (1001, 2.0, 'gold', 11)")
    val g = spark.table("dfw.db.e1").groupBy("tier")
      .agg(count(lit(1)).as("n"), sum("bonus").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g === Map("std" -> ((1001L, 3003L)), "gold" -> ((1L, 11L))))
  }

  test("filters over mixed files are exact (pushdown declines, values fill)") {
    spark.sql("CREATE TABLE dfw.db.f1 (id BIGINT)")
    spark.sql("INSERT INTO dfw.db.f1 SELECT id FROM range(0, 500)")
    spark.sql("ALTER TABLE dfw.db.f1 ADD COLUMN k INT DEFAULT 7")
    spark.sql("INSERT INTO dfw.db.f1 VALUES (500, 7), (501, 8), (502, NULL)")
    val t = spark.table("dfw.db.f1")
    // equality on the default value selects pre-evolution rows too
    assert(t.filter(col("k") === 7).count() === 501)
    assert(t.filter(col("k") =!= 7).count() === 1)
    assert(t.filter(col("k").isNull).count() === 1)
    assert(t.filter(col("k").isNotNull).count() === 502)
    // range + conjunction with a file-present column
    assert(t.filter(col("k") >= 7 && col("id") < 10).count() === 10)
    // IN probe
    assert(t.filter(col("k").isin(7, 8)).count() === 502)
  }

  test("aggregates over mixed files are exact (agg pushdown declines)") {
    spark.sql("CREATE TABLE dfw.db.a1 (id BIGINT)")
    spark.sql("INSERT INTO dfw.db.a1 SELECT id FROM range(0, 100)")
    spark.sql("ALTER TABLE dfw.db.a1 ADD COLUMN m BIGINT DEFAULT 5")
    spark.sql("INSERT INTO dfw.db.a1 VALUES (100, 50)")
    val r = spark.table("dfw.db.a1")
      .agg(count(col("m")).as("nm"), sum("m").as("s"),
        min("m").as("mn"), max("m").as("mx")).head()
    assert(r.getLong(0) === 101L)
    assert(r.getLong(1) === 100L * 5 + 50)
    assert(r.getLong(2) === 5L)
    assert(r.getLong(3) === 50L)
    // grouped BY the defaulted column
    val g = spark.table("dfw.db.a1").groupBy("m").count()
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(g === Map(5L -> 100L, 50L -> 1L))
  }

  test("SET DEFAULT moves only the INSERT side; exists default is pinned") {
    spark.sql("CREATE TABLE dfw.db.s1 (id BIGINT)")
    spark.sql("INSERT INTO dfw.db.s1 VALUES (1)")
    spark.sql("ALTER TABLE dfw.db.s1 ADD COLUMN tier STRING DEFAULT 'std'")
    spark.sql("ALTER TABLE dfw.db.s1 ALTER COLUMN tier SET DEFAULT 'gold'")
    spark.sql("INSERT INTO dfw.db.s1 (id) VALUES (2)")
    val got = spark.table("dfw.db.s1").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // row 1 predates the column: reads the ADD-time default, NOT the new
    // current default; row 2 inserted under the new current default
    assert(got === Seq((1L, "std"), (2L, "gold")))
    // DROP DEFAULT: future inserts must name the column or write NULL
    spark.sql("ALTER TABLE dfw.db.s1 ALTER COLUMN tier DROP DEFAULT")
    spark.sql("INSERT INTO dfw.db.s1 (id) VALUES (3)")
    val r3 = spark.table("dfw.db.s1").filter(col("id") === 3).head()
    assert(r3.isNullAt(1), "after DROP DEFAULT an omitted column is NULL")
    // the exists default STILL serves the pre-evolution row
    assert(spark.table("dfw.db.s1").filter(col("id") === 1)
      .head().getString(1) === "std")
  }

  test("UPDATE and DELETE conditions see the default; rewrites materialize it") {
    spark.sql("CREATE TABLE dfw.db.d1 (id BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dfw.db.d1 SELECT id, id FROM range(0, 100)")
    spark.sql("ALTER TABLE dfw.db.d1 ADD COLUMN tier STRING DEFAULT 'std'")
    spark.sql("INSERT INTO dfw.db.d1 VALUES (100, 100, 'gold')")
    // the condition matches pre-evolution rows via their default
    spark.sql("UPDATE dfw.db.d1 SET v = v + 1000 WHERE tier = 'std' AND id < 10")
    val t = spark.table("dfw.db.d1")
    assert(t.filter(col("v") >= 1000).count() === 10)
    // the rewrite materialized 'std' (not NULL) for rewritten rows
    assert(t.filter(col("tier").isNull).count() === 0)
    assert(t.filter(col("tier") === "std").count() === 100)
    // DELETE against the default
    spark.sql("DELETE FROM dfw.db.d1 WHERE tier = 'std' AND id >= 90 AND id < 100")
    assert(spark.table("dfw.db.d1").count() === 91)
    assert(spark.table("dfw.db.d1").filter(col("tier") === "std").count() === 90)
  }

  test("compaction materializes defaults and pushdown returns") {
    spark.sql("CREATE TABLE dfw.db.m1 (id BIGINT)")
    spark.sql("INSERT INTO dfw.db.m1 SELECT id FROM range(0, 2000)")
    spark.sql("ALTER TABLE dfw.db.m1 ADD COLUMN k BIGINT DEFAULT 9")
    spark.sql("INSERT INTO dfw.db.m1 SELECT id, 1 FROM range(2000, 2500)")
    spark.sql("CALL dfw.system.compact('db.m1', 64)")
    // after the rewrite every live file carries k → values unchanged
    val t = spark.table("dfw.db.m1")
    assert(t.filter(col("k") === 9).count() === 2000)
    assert(t.agg(sum("k")).head().getLong(0) === 2000L * 9 + 500)
    // and the footers now store the column physically everywhere
    val infos = ColeMetaCache.infos(s"$warehouse/db/m1", ColeIO.driverConf())
    assert(infos.nonEmpty &&
      infos.forall(_.meta.columns.exists(_.name == "k")),
      "compaction must materialize the defaulted column into every file")
  }

  test("guardrails: layout columns, unsupported types, non-constant SQL") {
    spark.sql("CREATE TABLE dfw.db.g1 (id BIGINT, ts TIMESTAMP, p STRING) " +
      "PARTITIONED BY (p)")
    // partition column defaults reject at CREATE
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE dfw.db.g2 (id BIGINT, p STRING DEFAULT 'x') " +
        "PARTITIONED BY (p)")
    }
    assert(e1.getMessage.contains("partition"))
    // non-constant defaults reject at the ALTER, loudly
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE dfw.db.g1 ADD COLUMN r DOUBLE DEFAULT rand()")
    }
    assert(e2.getMessage.toLowerCase.contains("constant") ||
      e2.getMessage.toLowerCase.contains("default"))
    // a time-travel read BEFORE the add must not see the column at all
    spark.sql("CALL dfw.system.versioning('db.g1')")
    spark.sql("INSERT INTO dfw.db.g1 VALUES (1, TIMESTAMP '2024-01-01 00:00:00', 'a')")
    spark.sql("ALTER TABLE dfw.db.g1 ADD COLUMN tier STRING DEFAULT 'std'")
    spark.sql("INSERT INTO dfw.db.g1 VALUES " +
      "(2, TIMESTAMP '2024-01-02 00:00:00', 'b', 'gold')")
    val v1 = spark.sql("SELECT * FROM dfw.db.g1 VERSION AS OF 1")
    assert(!v1.schema.fieldNames.contains("tier"),
      "snapshot before the ADD must not carry the column")
    assert(spark.table("dfw.db.g1").filter(col("tier") === "std").count() === 1)
  }

  test("timestamp defaults are timezone-stable; invalid casts reject at DDL (ANSI)") {
    spark.sql("CREATE TABLE dfw.db.tz1 (id BIGINT) USING cole")
    spark.sql("INSERT INTO dfw.db.tz1 VALUES (1)")
    // the exists default folds ONCE with the session timezone (UTC here)
    // and persists with an EXPLICIT UTC offset, so re-evaluation on any
    // executor JVM yields the same instant (ADVICE r13)
    spark.sql("ALTER TABLE dfw.db.tz1 ADD COLUMN ts TIMESTAMP " +
      "DEFAULT TIMESTAMP '2024-03-01 12:30:00'")
    val sidecar = ColeCatalog.readTableSpec(s"$warehouse/db/tz1",
      ColeIO.driverConf()).get._1
    val persisted = sidecar("ts").metadata.getString(ColeDefaults.ExistsKey)
    assert(persisted.contains("Z"),
      s"EXISTS default must persist with an explicit UTC offset: $persisted")
    spark.sql("INSERT INTO dfw.db.tz1 VALUES (2, DEFAULT)")
    val rows = spark.table("dfw.db.tz1").orderBy("id")
      .select(col("ts").cast("string")).collect().map(_.getString(0))
    assert(rows.toSeq === Seq("2024-03-01 12:30:00", "2024-03-01 12:30:00"),
      "exists-fill and INSERT-side default must be the same instant")
    // a castable-but-INVALID default fails AT DECLARATION under the ANSI
    // fold — it must never silently persist NULL (ADVICE r13)
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE dfw.db.tz1 ALTER COLUMN id SET DEFAULT 'abc'")
    }
    def msgs(t: Throwable): Seq[String] = Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("abc") || m.contains("convert") ||
      m.toLowerCase.contains("cast")),
      s"expected a loud invalid-default rejection, got: ${e.getMessage}")
  }
}
