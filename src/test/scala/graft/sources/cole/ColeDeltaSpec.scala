package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read UPDATE / MERGE / DELETE (ColeDeltaOperation,
  * SupportsDelta): on a vector-mode table, changed row ids become
  * deletion-vector ordinals and new images land in new files — the
  * files that merely shared a row group with a match stay
  * byte-identical. The differential twin is the same DML on a copy-mode
  * table.
  */
class ColeDeltaSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_delta_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.dlw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.dlw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def fileStamps(dir: String): Set[(String, Long, Long)] =
    ColeIO.listPartitioned(dir, conf).map { case (st, _) =>
      (st.getPath.toString, st.getLen, st.getModificationTime)
    }.toSet

  test("_cole_pos metadata column: physical file positions, row and columnar paths") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pos"
    (0 until 3000).map(i => (i.toLong, i * 2L)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").option("rowGroupSize", "512").save(t)
    val withPos = spark.table("dlw.db.pos")
      .select(col("k"), col("_cole_pos"))
    // single sorted file: position == k
    assert(withPos.filter(col("k") =!= col("_cole_pos")).count() === 0L)
    // positions stay PHYSICAL under a filter (selection compaction)
    val f = spark.table("dlw.db.pos").filter(col("k") >= 1000L && col("k") < 1010L)
      .select(col("k"), col("_cole_pos")).collect()
    assert(f.forall(r => r.getLong(0) === r.getLong(1)))
  }

  test("MERGE merge-on-read: only changed rows move; co-resident rows untouched") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/mor"
    (0 until 10000).map(i => (i.toLong, "new", i.toLong)).toDF("k", "state", "v")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dlw.system.delete_mode('db.mor', 'vector')")
    Seq.range(0L, 10000L, 500L).map(k => (k, k + 7L)).toDF("k", "nv")
      .createOrReplaceTempView("delta_src")
    val before = fileStamps(t)
    spark.sql(
      """MERGE INTO dlw.db.mor t USING delta_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv, state = 'upd'
        |WHEN NOT MATCHED THEN INSERT (k, state, v) VALUES (s.k, 'ins', s.nv)
        |""".stripMargin)
    // both original files stay byte-identical (20 matched rows would
    // have rewritten BOTH files under copy-on-write)
    assert((before -- fileStamps(t)).isEmpty,
      "merge-on-read MERGE must not rewrite the original files")
    val back = spark.table("dlw.db.mor")
    assert(back.count() === 10000L)
    assert(back.filter(col("state") === "upd").count() === 20L)
    assert(back.filter(col("k") === 500L).select("v").head.getLong(0) === 507L)
    assert(back.filter(col("k") === 501L).select("v").head.getLong(0) === 501L)
    assert(back.groupBy("k").count().filter(col("count") > 1).count() === 0L)
    // MERGE with inserts: new keys
    Seq(20001L, 20002L).map(k => (k, k)).toDF("k", "nv")
      .createOrReplaceTempView("delta_src2")
    spark.sql(
      """MERGE INTO dlw.db.mor t USING delta_src2 s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (k, state, v) VALUES (s.k, 'ins', s.nv)
        |""".stripMargin)
    assert(spark.table("dlw.db.mor").count() === 10002L)
    assert(spark.table("dlw.db.mor").filter(col("state") === "ins").count() === 2L)
  }

  test("delta DML matches the copy-on-write twin exactly (differential)") {
    val s = spark
    import s.implicits._
    def mk(name: String, vector: Boolean): String = {
      val t = s"$warehouse/db/$name"
      (0 until 5000).map(i => (i.toLong, (i % 13).toLong, s"t${i % 7}"))
        .toDF("k", "g", "tag").coalesce(3)
        .write.format("cole").mode("overwrite").save(t)
      if (vector) spark.sql(s"CALL dlw.system.delete_mode('db.$name', 'vector')")
      t
    }
    mk("twin_v", vector = true)
    mk("twin_c", vector = false)
    def runAll(n: String): Unit = {
      spark.sql(s"UPDATE dlw.db.$n SET g = g + 100 WHERE k >= 1000 AND k < 1200")
      spark.sql(s"DELETE FROM dlw.db.$n WHERE tag = 't3' AND k < 2500")
      Seq.range(0L, 5000L, 777L).map(k => (k, k * 2L)).toDF("k", "nv")
        .createOrReplaceTempView(s"twin_src_$n")
      spark.sql(
        s"""MERGE INTO dlw.db.$n t USING twin_src_$n s ON t.k = s.k
           |WHEN MATCHED AND t.g < 50 THEN UPDATE SET g = s.nv
           |WHEN NOT MATCHED THEN INSERT (k, g, tag) VALUES (s.k, -1, 'ins')
           |""".stripMargin)
    }
    runAll("twin_v")
    runAll("twin_c")
    val a = spark.table("dlw.db.twin_v").collect().map(_.toSeq).toSet
    val b = spark.table("dlw.db.twin_c").collect().map(_.toSeq).toSet
    assert(a === b, s"merge-on-read diverged from copy-on-write: " +
      s"${(a diff b).take(3)} extra, ${(b diff a).take(3)} missing")
  }

  test("delta DELETE (non-convertible condition) vectors rows, no rewrites") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/nc"
    (0 until 3000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(2)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dlw.system.delete_mode('db.nc', 'vector')")
    val before = fileStamps(t)
    // % is not COLE-convertible: routes to the row-level op, which in
    // vector mode is the DELTA path — row ids vector away, zero rewrites
    spark.sql("DELETE FROM dlw.db.nc WHERE k % 3 = 0")
    assert(fileStamps(t) === before,
      "a non-convertible DELETE on a vector table must not rewrite files")
    assert(spark.table("dlw.db.nc").count() ===
      3000L - (0 until 3000).count(_ % 3 == 0))
  }

  test("sequential delta DMLs compose: vectors accumulate across commits") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/seq"
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dlw.system.delete_mode('db.seq', 'vector')")
    // three delta UPDATEs against the SAME original file: each extends
    // the vector (old image of the prior update's NEW file is vectored
    // in ITS file) and lands a fresh image — values chain exactly
    spark.sql("UPDATE dlw.db.seq SET v = v + 1 WHERE k = 5")
    spark.sql("UPDATE dlw.db.seq SET v = v + 10 WHERE k = 5")
    spark.sql("UPDATE dlw.db.seq SET v = v + 100 WHERE k = 5")
    val rows = spark.table("dlw.db.seq").filter(col("k") === 5L).collect()
    assert(rows.length === 1, s"duplicate images after chained updates: ${rows.toSeq}")
    assert(rows.head.getLong(1) === 5L + 111L)
    assert(spark.table("dlw.db.seq").count() === 1000L)
  }
}
