package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level change feed (ColeChangeFeed): CDC over a mutable COLE
  * table. The contract under test: for every served range,
  * `T(from) minus deletes plus inserts = T(to)` as a row multiset, with
  * per-commit `_commit_version` attribution; rollback ranges refuse; the
  * plain insert feed refuses ANY row-removing commit (overwrite and
  * truncate included, not just DML ops).
  */
class ColeChangeFeedSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_cf_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.cfw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.cfw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** Multiset equality via sorted row dumps. */
  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    val ca = a.columns.sorted
    assert(ca.toSeq === b.columns.sorted.toSeq)
    val sa = a.select(ca.map(col): _*).collect().map(_.toString).sorted
    val sb = b.select(ca.map(col): _*).collect().map(_.toString).sorted
    assert(sa.toSeq === sb.toSeq)
  }

  private def applyFeed(base: DataFrame, feed: DataFrame): DataFrame = {
    val cols = base.columns
    val del = feed.filter(col(ColeChangeFeed.ChangeTypeCol) === "delete")
      .select(cols.map(col): _*)
    val ins = feed.filter(col(ColeChangeFeed.ChangeTypeCol) === "insert")
      .select(cols.map(col): _*)
    base.exceptAll(del).unionAll(ins)
  }

  test("UPDATE range: delete old image + insert new image, reconstructs") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/u"
    (0 until 2).foreach { part =>
      (part * 500 until (part + 1) * 500).map(i => (i.toLong, s"v$i", i * 2L))
        .toDF("k", "tag", "v").coalesce(1)
        .write.format("cole").mode(if (part == 0) "overwrite" else "append").save(t)
    }
    ColeVersions.enable(t, conf) // v1
    val v1 = s.read.format("cole").option("versionAsOf", "1").load(t)
    spark.sql("UPDATE cfw.db.u SET v = v + 100000 WHERE k % 7 = 3") // v2
    val feed = ColeChangeFeed.read(s, t, 1L, 2L)
    val changed = (0 until 1000).count(_ % 7 == 3)
    assert(feed.filter(col("_change_type") === "delete").count() === changed)
    assert(feed.filter(col("_change_type") === "insert").count() === changed)
    assert(feed.select("_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    // old images carry the pre-update value, new images the post-update
    val old3 = feed.filter(col("_change_type") === "delete" && col("k") === 3L)
    assert(old3.select("v").head.getLong(0) === 6L)
    val new3 = feed.filter(col("_change_type") === "insert" && col("k") === 3L)
    assert(new3.select("v").head.getLong(0) === 100006L)
    sameRows(applyFeed(v1, feed), spark.table("cfw.db.u"))
  }

  test("DELETE and MERGE ranges serve exact deltas per commit") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/m"
    (0 until 1000).map(i => (i.toLong, "new", i.toLong)).toDF("k", "state", "v")
      .coalesce(2).write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    spark.sql("DELETE FROM cfw.db.m WHERE k % 5 = 0") // v2
    Seq.range(0L, 1000L, 50L).map(k => (k, k + 7L)).toDF("k", "nv")
      .createOrReplaceTempView("cf_src")
    spark.sql(
      """MERGE INTO cfw.db.m t USING cf_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv, state = 'upd'
        |WHEN NOT MATCHED THEN INSERT (k, state, v) VALUES (s.k, 'ins', s.nv)
        |WHEN NOT MATCHED BY SOURCE AND t.k > 990 THEN DELETE
        |""".stripMargin) // v3
    val v1 = s.read.format("cole").option("versionAsOf", "1").load(t)
    val v2 = s.read.format("cole").option("versionAsOf", "2").load(t)
    val cur = spark.table("cfw.db.m")
    sameRows(applyFeed(v1,
      ColeChangeFeed.read(s, t, 1L, 2L)), v2)
    sameRows(applyFeed(v2,
      ColeChangeFeed.read(s, t, 2L, 3L)), cur)
    // and the SPANNING range reconstructs end-to-end too
    sameRows(applyFeed(v1,
      ColeChangeFeed.read(s, t, 1L, 3L)), cur)
    // per-commit attribution: v2's feed rows are all deletes
    val f2 = ColeChangeFeed.read(s, t, 1L, 2L)
    assert(f2.filter(col("_change_type") === "insert").count() === 0)
    assert(f2.count() === 200)
  }

  test("append commits serve as pure inserts with no diff") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/a"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    (100 until 150).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("append").save(t) // v2
    val feed = ColeChangeFeed.read(s, t, 1L, 2L)
    assert(feed.filter(col("_change_type") === "delete").count() === 0)
    assert(feed.count() === 50)
    assert(feed.agg(min("k")).head.getLong(0) === 100L)
  }

  test("overwrite serves as full delete+insert; insert-only feed refuses it") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/o"
    (0 until 100).map(i => (i.toLong, "a")).toDF("k", "tag")
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    (0 until 40).map(i => (i.toLong, "b")).toDF("k", "tag")
      .write.format("cole").mode("overwrite").save(t) // v2 = truncate+write
    val v1 = s.read.format("cole").option("versionAsOf", "1").load(t)
    val feed = ColeChangeFeed.read(s, t, 1L, 2L)
    sameRows(applyFeed(v1, feed), spark.table("cfw.db.o"))
    assert(feed.filter(col("_change_type") === "delete").count() === 100)
    assert(feed.filter(col("_change_type") === "insert").count() === 40)
    // ADVICE guard: the INSERT-ONLY feed must fail loudly on ANY
    // row-removing commit — by record shape, not an op allowlist
    val e = intercept[IllegalArgumentException] {
      s.read.format("cole").option("changesFrom", "1").option("changesTo", "2")
        .load(t).count()
    }
    assert(e.getMessage.contains("row-removing"))
  }

  test("rollback ranges refuse loudly in both feeds") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/r"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    (100 until 120).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("append").save(t) // v2
    ColeVersions.rollback(t, conf, 1L) // v3
    val e = intercept[IllegalArgumentException] {
      ColeChangeFeed.read(s, t, 1L, 3L).count()
    }
    assert(e.getMessage.contains("rollback"))
    // but the pre-rollback range still serves
    assert(ColeChangeFeed.read(s, t, 1L, 2L).count() === 20)
  }

  test("pairKey upgrades a COW UPDATE to update_preimage/postimage pairs") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pk"
    (0 until 200).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    spark.sql("UPDATE cfw.db.pk SET v = v + 1000 WHERE k >= 150") // v2 (COW)
    spark.sql("DELETE FROM cfw.db.pk WHERE k < 10")               // v3 (COW)
    val feed = ColeChangeFeed.read(s, t, 1L, 3L, pairKey = Seq("k"))
    def rows(t0: String, v: Long) = feed
      .filter(col("_change_type") === t0 && col("_commit_version") === v)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows("update_preimage", 2L) ===
      (150 until 200).map(i => (i.toLong, i.toLong)).toSet)
    assert(rows("update_postimage", 2L) ===
      (150 until 200).map(i => (i.toLong, i.toLong + 1000)).toSet)
    assert(rows("delete", 2L).isEmpty && rows("insert", 2L).isEmpty,
      "a pure UPDATE commit must pair every image")
    // the DELETE commit has no insert side: rows stay plain deletes
    assert(rows("delete", 3L) === (0 until 10).map(i => (i.toLong, i.toLong)).toSet)
    assert(rows("update_preimage", 3L).isEmpty)
    // without a pairKey the same range serves the two-type shape
    val plain = ColeChangeFeed.read(s, t, 1L, 3L)
    assert(plain.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSet === Set("insert", "delete"))
  }

  test("pairKey over a merge-on-read MERGE: updates pair, genuine inserts stay") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pkm"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1
    spark.sql("CALL cfw.system.delete_mode('db.pkm', 'vector')")
    (80 until 120).map(i => (i.toLong, i.toLong + 5000)).toDF("k", "v")
      .createOrReplaceTempView("pkm_src")
    spark.sql("""MERGE INTO cfw.db.pkm t USING pkm_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""") // v2 (MOR)
    val feed = ColeChangeFeed.read(s, t, 1L, 2L, pairKey = Seq("k"))
    def rows(t0: String) = feed.filter(col("_change_type") === t0)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows("update_preimage") ===
      (80 until 100).map(i => (i.toLong, i.toLong)).toSet,
      "MOR update old images must come from the pinned ordinals")
    assert(rows("update_postimage") ===
      (80 until 100).map(i => (i.toLong, i.toLong + 5000)).toSet)
    assert(rows("insert") ===
      (100 until 120).map(i => (i.toLong, i.toLong + 5000)).toSet,
      "unmatched source rows are genuine inserts, not update images")
    assert(rows("delete").isEmpty)
  }

  test("empty range yields an empty, correctly-shaped frame") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/e"
    (0 until 10).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf)
    val feed = ColeChangeFeed.read(s, t, 1L, 1L)
    assert(feed.count() === 0)
    assert(feed.columns.toSet ===
      Set("k", "v", "_change_type", "_commit_version"))
  }

  test("ordinal-probe slicing bounds the per-task payload regardless of delta size") {
    // ~16k pairs/slice at ~25 B/pair serialized ≈ a few hundred KB per
    // task binary — the r12 fix for the bench's "task of very large
    // size" warning (one slice used to carry a whole 60k-pair delta)
    assert(ColeChangeFeed.probeSlices(0) === 1)
    assert(ColeChangeFeed.probeSlices(16000) === 1)
    assert(ColeChangeFeed.probeSlices(64000) >= 4)
    assert(ColeChangeFeed.probeSlices(1200000) >= 73) // sf1-scale delta
    // monotone, and never more slices than ~1-per-16k-pairs + 1
    (1 to 20).foreach { i =>
      val n = i * 50000
      assert(ColeChangeFeed.probeSlices(n) <= n / 16384 + 1)
    }
  }
}
