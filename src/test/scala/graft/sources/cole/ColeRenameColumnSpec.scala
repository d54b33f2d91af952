package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ALTER TABLE RENAME COLUMN (r9): metadata-only — a rename map entry in
  * the `_tablespec` applied at every metadata resolution, zero data
  * rewrites. Old files keep the bytes under the old name and resolve
  * under the new one; appends write the new name; rename sources cannot
  * come back (re-ADD and path-append guards); layout-load-bearing
  * columns are protected; chains compose; compaction homogenizes.
  */
class ColeRenameColumnSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_rn_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.rnw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.rnw.warehouse", warehouse)
    s
  }

  private def fileStamps(dir: String): Set[(String, Long, Long)] =
    ColeIO.listPartitioned(dir, ColeIO.driverConf()).map { case (st, _) =>
      (st.getPath.toString, st.getLen, st.getModificationTime)
    }.toSet

  test("rename is metadata-only; old data resolves under the new name") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rn"
    (0 until 1000).map(i => (i.toLong, s"v$i", i * 2L)).toDF("k", "tag", "amount")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    val before = fileStamps(t)
    spark.sql("ALTER TABLE rnw.db.rn RENAME COLUMN amount TO total")
    assert(fileStamps(t) === before, "RENAME COLUMN must rewrite zero files")
    val back = spark.table("rnw.db.rn")
    assert(back.columns.toSeq === Seq("k", "tag", "total"))
    assert(back.count() === 1000L)
    assert(back.filter(col("k") === 7L).select("total").head.getLong(0) === 14L)
    // filters on the renamed column are exact (residual, stat-skip still on)
    assert(back.filter(col("total") >= 1000L).count() === 500L)
    assert(back.agg(sum("total")).head.getLong(0) === (0 until 1000).map(_ * 2L).sum)
    // path-based reads see the rename too (tablespec is table metadata)
    assert(spark.read.format("cole").load(t).columns.contains("total"))
  }

  test("appends write the new name; mixed files resolve; compaction homogenizes") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rnmix"
    (0 until 500).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    spark.sql("ALTER TABLE rnw.db.rnmix RENAME COLUMN v TO w")
    spark.sql("INSERT INTO rnw.db.rnmix VALUES (500, 9999)")
    val back = spark.table("rnw.db.rnmix")
    assert(back.count() === 501L)
    assert(back.filter(col("k") === 100L).select("w").head.getLong(0) === 300L)
    assert(back.filter(col("k") === 500L).select("w").head.getLong(0) === 9999L)
    // mixed old-name/new-name files: aggregate pushdown declines...
    val agg = back.agg(sum("w").as("s"))
    assert(!agg.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    val expect = (0 until 500).map(_ * 3L).sum + 9999L
    assert(agg.head.getLong(0) === expect)
    // ...and returns after compaction rewrites under current names
    ColeCompact.compact(s, t, 512L << 20)
    val agg2 = spark.table("rnw.db.rnmix").agg(sum("w").as("s"))
    assert(agg2.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "post-compaction renamed table must push aggregates again")
    assert(agg2.head.getLong(0) === expect)
  }

  test("chains compose; DML still works on a renamed table") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rnchain"
    (0 until 300).map(i => (i.toLong, i.toLong)).toDF("k", "a")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    spark.sql("ALTER TABLE rnw.db.rnchain RENAME COLUMN a TO b")
    spark.sql("ALTER TABLE rnw.db.rnchain RENAME COLUMN b TO c")
    val back = spark.table("rnw.db.rnchain")
    assert(back.columns.toSeq === Seq("k", "c"))
    assert(back.filter(col("k") === 5L).select("c").head.getLong(0) === 5L)
    // row-level DML resolves through the rename (reads by index)
    spark.sql("UPDATE rnw.db.rnchain SET c = c + 1000 WHERE k < 10")
    assert(spark.table("rnw.db.rnchain").filter(col("k") === 5L)
      .select("c").head.getLong(0) === 1005L)
    spark.sql("DELETE FROM rnw.db.rnchain WHERE c >= 1000 AND c < 1010")
    assert(spark.table("rnw.db.rnchain").count() === 290L)
  }

  test("guards: sources cannot resurrect, layout columns protected") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rng"
    (0 until 100).map(i => (i.toLong, i.toLong, (i % 5).toString))
      .toDF("k", "v", "p")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(t)
    spark.sql("ALTER TABLE rnw.db.rng RENAME COLUMN v TO vv")
    // re-ADD of the stored (old) name: stale values would resurrect
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE rnw.db.rng ADD COLUMN v BIGINT")
    }
    assert(e1.getMessage.contains("stored name of a renamed column"))
    // path-based append carrying the old name: same hazard
    val e2 = intercept[Exception] {
      (0 until 5).map(i => (i.toLong, i.toLong, "9")).toDF("k", "v", "p")
        .write.format("cole").mode("append").option("bucketBy", "4:k").save(t)
    }
    assert(e2.getMessage.contains("stored name"))
    // bucket column protected
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE rnw.db.rng RENAME COLUMN k TO kk")
    }
    assert(e3.getMessage.contains("bucket column"))
    // rename onto an existing name rejected
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE rnw.db.rng RENAME COLUMN vv TO p")
    }
    assert(e4.getMessage.contains("already exists"))
  }

  test("DROP of a renamed column hides the old files' bytes too") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rndrop"
    (0 until 50).map(i => (i.toLong, i.toLong, s"x$i")).toDF("k", "v", "tag")
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    spark.sql("ALTER TABLE rnw.db.rndrop RENAME COLUMN v TO w")
    spark.sql("ALTER TABLE rnw.db.rndrop DROP COLUMN w")
    val back = spark.table("rnw.db.rndrop")
    assert(back.columns.toSeq === Seq("k", "tag"))
    assert(back.count() === 50L)
  }
}
