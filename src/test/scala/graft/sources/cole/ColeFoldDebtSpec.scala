package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fold debt (r16, verdict ask #5): the metadata-only aggregate path is
  * all-or-nothing per query — ONE pre-SUMS (v1) straggler file forfeits
  * it for the whole table. Pinned here:
  *   - `$files`/`$partitions` report `sums_missing` so nightly
  *     maintenance can SEE the debt;
  *   - a mixed table's global aggregate does not fold (and stays exact);
  *   - `compact_debt(fold_debt => 1)` rewrites EXACTLY the straggler
  *     directories (debt-free directories byte-identical), forcing v2;
  *   - after migration the debt reads zero and foldedPlans engages.
  */
class ColeFoldDebtSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_fdbt_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.fdbt", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.fdbt.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  test("debt visible, fold forfeited, compact_debt migrates exactly the stragglers") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/mix"
    // partitioned table: era=old lands as v1 (pre-SUMS), era=new as v2
    (0 until 500).map(i => (i.toLong, "old", i.toLong))
      .toDF("id", "era", "v")
      .coalesce(1).write.format("cole").partitionBy("era")
      .option("formatVersion", "1").mode("overwrite").save(t)
    (500 until 900).map(i => (i.toLong, "new", i.toLong))
      .toDF("id", "era", "v")
      .coalesce(1).write.format("cole").partitionBy("era")
      .option("formatVersion", "2").mode("append").save(t)

    // the debt is visible at file and directory grain
    val files = spark.sql(
      "SELECT partition, sums_missing FROM fdbt.db.`mix$files`").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(files("era=old") === true && files("era=new") === false)
    val parts = spark.sql(
      "SELECT partition, sums_missing FROM fdbt.db.`mix$partitions`")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(parts("era=old") === 1 && parts("era=new") === 0)

    // one straggler forfeits the fold for the whole table — but stays exact
    def agged = spark.read.format("cole").load(t)
      .agg(sum("v"), count(lit(1)), min("id"), max("id"))
    agged.head() // footer warm
    val folds0 = ColeAggFold.foldedPlans.get()
    val r0 = agged.head()
    assert(ColeAggFold.foldedPlans.get() === folds0,
      "fold engaged over a pre-SUMS straggler")
    assert(r0.getLong(0) === (0L until 900L).sum && r0.getLong(1) === 900L)

    // migrate: exactly the straggler directory rewrites, forced v2
    val newBytes = ColeIO.listPartitioned(t, conf)
      .filter(_._1.getPath.toString.contains("era=new"))
      .map(st => st._1.getPath.toString -> (st._1.getLen,
        st._1.getModificationTime)).toMap
    val res = spark.sql(
      "CALL fdbt.system.compact_debt('db.mix', 128, 10, 4, fold_debt => 1)")
      .collect().head
    assert(res.getLong(0) === 1L, s"expected exactly 1 dir compacted: $res")
    assert(ColeIO.listPartitioned(t, conf)
      .filter(_._1.getPath.toString.contains("era=new"))
      .map(st => st._1.getPath.toString -> (st._1.getLen,
        st._1.getModificationTime)).toMap === newBytes,
      "fold_debt compaction touched a debt-free directory")

    // debt cleared; the fold engages; values unchanged
    assert(spark.sql(
      "SELECT SUM(CAST(sums_missing AS INT)) FROM fdbt.db.`mix$files`")
      .head().getLong(0) === 0L)
    agged.head() // fresh footer warm (files changed)
    val folds1 = ColeAggFold.foldedPlans.get()
    val r1 = agged.head()
    assert(ColeAggFold.foldedPlans.get() > folds1,
      "fold did not engage after fold_debt migration")
    assert(r1 === r0)
  }

  test("STRB debt: pre-extension string files migrate; $history flags the commit") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/strdebt"
    // a v1 string-column file: no tails at all, string min/max can't fold
    (0 until 300).map(i => (i.toLong, f"s${i % 40}%03d")).toDF("id", "s")
      .coalesce(1).write.format("cole")
      .option("formatVersion", "1").mode("overwrite").save(t)
    ColeVersions.enable(t, conf) // v1 = baseline carrying the debt file
    (300 until 400).map(i => (i.toLong, f"s${i % 40}%03d")).toDF("id", "s")
      .coalesce(1).write.format("cole")
      .option("formatVersion", "2").mode("append").save(t) // v2, has STRB
    // file-grain debt: strb_missing names exactly the pre-extension file
    assert(spark.sql(
      "SELECT SUM(CAST(strb_missing AS INT)) FROM fdbt.db.`strdebt$files`")
      .head().getLong(0) === 1L)
    // commit-grain provenance: the nightly trigger is a WHERE clause
    val hist = spark.sql(
      "SELECT version, adds_fold_debt FROM fdbt.db.`strdebt$history`")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(hist(1L) === true, "the baseline commit added the debt file")
    assert(hist(2L) === false, "the v2 append carries both tails")
    // the straggler forfeits the string fold — exactness intact
    def agged = spark.read.format("cole").load(t)
      .agg(min("s"), max("s"), count(lit(1)))
    agged.head()
    val folds0 = ColeAggFold.foldedPlans.get()
    val r0 = agged.head()
    assert(ColeAggFold.foldedPlans.get() === folds0,
      "string fold engaged over a pre-STRB straggler")
    assert(r0.getString(0) === "s000" && r0.getLong(2) === 400L)
    // migrate and the string fold engages
    spark.sql(
      "CALL fdbt.system.compact_debt('db.strdebt', 128, 10, 4, fold_debt => 1)")
    assert(spark.sql(
      "SELECT SUM(CAST(strb_missing AS INT)) FROM fdbt.db.`strdebt$files`")
      .head().getLong(0) === 0L)
    assert(spark.sql("SELECT COUNT(*) FROM fdbt.db.`strdebt$history` " +
      "WHERE adds_fold_debt").head().getLong(0) === 0L,
      "post-migration no live commit should carry fold debt")
    agged.head() // fresh footer warm
    val folds1 = ColeAggFold.foldedPlans.get()
    val r1 = agged.head()
    assert(ColeAggFold.foldedPlans.get() > folds1,
      "string fold did not engage after migration")
    assert(r1 === r0)
  }

  test("fold_debt => 0 (default) leaves pre-SUMS files alone") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/keep"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .coalesce(1).write.format("cole")
      .option("formatVersion", "1").mode("overwrite").save(t)
    val before = ColeIO.listPartitioned(t, conf)
      .map(st => st._1.getPath.toString -> st._1.getModificationTime).toMap
    spark.sql("CALL fdbt.system.compact_debt('db.keep', 128, 10, 4)")
    assert(ColeIO.listPartitioned(t, conf)
      .map(st => st._1.getPath.toString -> st._1.getModificationTime)
      .toMap === before, "default compact_debt rewrote a v1 file")
  }
}
