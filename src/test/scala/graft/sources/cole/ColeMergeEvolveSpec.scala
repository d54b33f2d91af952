package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `MERGE INTO ... WITH SCHEMA EVOLUTION` (r14): the connector
  * advertises `AUTOMATIC_SCHEMA_EVOLUTION`, so the analyzer diffs the
  * merge source's schema against the table and routes the differences
  * through the catalog's alterTable — the SAME add-column and
  * type-widening machinery DDL uses (old files keep serving: nulls for
  * missing columns, per-file widened lanes). Pinned here:
  *   - a source-only column lands via UPDATE SET * / INSERT *: matched
  *     rows carry it, untouched rows read NULL from their old files;
  *   - INT→BIGINT widening from the source schema evolves the column
  *     type and old files still serve;
  *   - WITHOUT the clause, the same merge leaves the schema alone.
  */
class ColeMergeEvolveSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_mev_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.mew", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.mew.warehouse", warehouse)
    s
  }

  test("a source-only column evolves in through UPDATE SET * / INSERT *") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/evadd"
    (0L until 10L).map(i => (i, i * 10)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    (5L until 15L).map(i => (i, i * 100, s"x$i"))
      .toDF("id", "v", "extra").createOrReplaceTempView("mev_src")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mew.db.evadd t
        |USING mev_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.table("mew.db.evadd")
    assert(out.schema.fieldNames.toSeq === Seq("id", "v", "extra"))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sortBy(_._1)
    // 0..4 untouched (old file, extra reads NULL), 5..9 updated,
    // 10..14 inserted — all with the evolved column populated
    assert(rows.take(5).toSeq ===
      (0L until 5L).map(i => (i, i * 10, None)))
    assert(rows.drop(5).toSeq ===
      (5L until 15L).map(i => (i, i * 100, Some(s"x$i"))))
  }

  test("ALTER COLUMN TYPE widens INT -> BIGINT in place; old files still serve") {
    // Spark's auto-evolution rule forwards only ADD COLUMN changes (a
    // wider source type raises its own analysis error), so widening is
    // the explicit-DDL half of the evolution story: metadata-only, the
    // read path's per-file lane union already handles the old files.
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/evwide"
    (0 until 8).map(i => (i.toLong, i)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    assert(spark.table("mew.db.evwide").schema("v").dataType ===
      org.apache.spark.sql.types.IntegerType)
    spark.sql("ALTER TABLE mew.db.evwide ALTER COLUMN v TYPE BIGINT")
    assert(spark.table("mew.db.evwide").schema("v").dataType ===
      org.apache.spark.sql.types.LongType)
    // the widened column takes post-int values through plain DML...
    Seq((6L, 5_000_000_000L), (20L, 7_000_000_000L)).toDF("id", "v")
      .createOrReplaceTempView("mev_wide_src")
    spark.sql(
      """MERGE INTO mew.db.evwide t
        |USING mev_wide_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.table("mew.db.evwide").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got === (0L until 6L).map(i => (i, i)) ++
      Seq((6L, 5_000_000_000L), (7L, 7L), (20L, 7_000_000_000L)))
    // ...and non-widening changes stay loud: narrowing dies in Spark's
    // own analyzer, a type CHANGE that up-casts but doesn't lane-widen
    // (BIGINT -> STRING) dies in our catalog guard
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE mew.db.evwide ALTER COLUMN v TYPE INT")
    }.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE mew.db.evwide ALTER COLUMN v TYPE STRING")
    }.getMessage.contains("widen"))
  }

  test("without the clause the same merge leaves the schema alone") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/evnone"
    (0L until 5L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    Seq((1L, 11L, "y")).toDF("id", "v", "extra")
      .createOrReplaceTempView("mev_none_src")
    spark.sql(
      """MERGE INTO mew.db.evnone t USING mev_none_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET t.v = s.v""".stripMargin)
    assert(spark.table("mew.db.evnone").schema.fieldNames.toSeq ===
      Seq("id", "v"))
    assert(spark.table("mew.db.evnone").where("id = 1").head().getLong(1)
      === 11L)
  }
}
