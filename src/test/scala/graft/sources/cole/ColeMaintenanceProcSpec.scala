package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `CALL cole.system.zorder / bloom_index` — table re-layout and
  * secondary-index maintenance as SQL, through the same crash-safe
  * two-phase swap as compaction. Z-order is row-preserving (commits as a
  * compaction: version feeds stay serveable, streams never replay).
  */
class ColeMaintenanceProcSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_mx_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.mxw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.mxw.warehouse", warehouse)
    s
  }

  test("CALL zorder: in-place re-cluster, exact rows, 2-D row-group pruning") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/z"
    // row-major grid: linear order is tight in x, terrible in y
    val n = 256
    val df = (0 until n * n).map { i => (i / n, i % n, i.toLong) }
      .toDF("x", "y", "payload")
    df.coalesce(4).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "4096").save(t)
    ColeVersions.enable(t, ColeIO.driverConf()) // v1
    def survivors(cond: org.apache.spark.sql.Column): Int =
      spark.read.format("cole").load(t).filter(cond)
        .queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan
        }.head.asInstanceOf[ColeScan].planInputPartitions()
        .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    val yBefore = survivors(col("y") < 16)
    val res = spark.sql(
      s"CALL mxw.system.zorder('db.z', 'x', 'y', 64)").collect()
    assert(res.head.getLong(0) >= 1L) // rewrote at least one dir
    // rows exactly preserved
    val back = spark.read.format("cole").load(t)
    assert(back.count() === (n * n).toLong)
    assert(back.agg(sum("payload")).head.getLong(0) ===
      (0L until (n * n).toLong).sum)
    // y-predicates now prune row groups (they couldn't before)
    val yAfter = survivors(col("y") < 16)
    assert(yAfter < yBefore,
      s"z-order must shrink y-filter survivors: $yBefore -> $yAfter")
    // row-preserving commit: the version log serves and the insert feed
    // treats it as a compaction (contributes nothing)
    val recs = ColeVersions.records(t, ColeIO.driverConf())
    assert(recs.last.op === "compact")
    assert(spark.read.format("cole")
      .option("changesFrom", "1").option("changesTo", recs.last.version.toString)
      .load(t).count() === 0L)
  }

  test("CALL zorder on a bucketed table is rejected loudly") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/zb"
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(t)
    val e = intercept[Exception] {
      spark.sql(s"CALL mxw.system.zorder('db.zb', 'k', 'v', 64)").collect()
    }
    assert(e.getMessage.contains("BUCKETED"))
  }

  test("CALL bloom_index: builds sidecars; point lookups skip row groups") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/bi"
    val df = (0 until 20000).map(i => (i.toLong, f"u-$i%07d-${i * 2654435761L}%x"))
      .toDF("id", "url")
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "2048").save(t)
    val res = spark.sql(
      s"CALL mxw.system.bloom_index('db.bi', 'url')").collect()
    assert(res.head.getLong(0) === 1L)
    val (fs0, _) = ColeIO.resolve(t, ColeIO.driverConf())
    val dataFile = ColeIO.listPartitioned(t, ColeIO.driverConf()).head._1
    assert(fs0.exists(new org.apache.hadoop.fs.Path(
      ColeBloomIndex.sidecarPath(dataFile.getPath.toString))))
    // an absent key prunes every row group at planning via the sidecar
    val probe = spark.read.format("cole").load(t)
      .filter(col("url") === "u-absent").count()
    assert(probe === 0L)
  }

  private def stampsByDir(t: String): Map[String, Set[(String, Long, Long)]] =
    ColeIO.listPartitioned(t, ColeIO.driverConf())
      .map { case (st, _) => (st.getPath.getParent.getName,
        (st.getPath.getName, st.getLen, st.getModificationTime)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("CALL compact_debt: only small-file debtor directories rewrite") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/dbt"
    // partition a: 4 small files (debtor); partition b: 1 file (clean)
    (0 until 4).foreach(k =>
      (k * 100 until (k + 1) * 100).map(i => (i.toLong, "a", i.toLong))
        .toDF("k", "p", "v").coalesce(1).write.format("cole")
        .mode(if (k == 0) "overwrite" else "append").partitionBy("p").save(t))
    (1000 until 1400).map(i => (i.toLong, "b", i.toLong))
      .toDF("k", "p", "v").coalesce(1).write.format("cole")
      .mode("append").partitionBy("p").save(t)
    val before = stampsByDir(t)
    assert(before("p=a").size === 4 && before("p=b").size === 1)
    val r = spark.sql(
      "CALL mxw.system.compact_debt('db.dbt', 512, 10, 3)").head()
    assert(r.getLong(0) === 1L, "exactly one debtor directory must rewrite")
    val after = stampsByDir(t)
    assert(after("p=a").size === 1, "debtor directory must compact to one file")
    assert(after("p=b") === before("p=b"),
      "the under-threshold directory must stay byte-identical")
    assert(spark.read.format("cole").load(t).count() === 800L)
  }

  test("CALL compact_debt: vector-debt directories rewrite, clean ones do not") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/dbv"
    (0 until 500).map(i => (i.toLong, "a", i.toLong)).toDF("k", "p", "v")
      .coalesce(1).write.format("cole").mode("overwrite")
      .partitionBy("p").save(t)
    (500 until 1000).map(i => (i.toLong, "b", i.toLong)).toDF("k", "p", "v")
      .coalesce(1).write.format("cole").mode("append")
      .partitionBy("p").save(t)
    spark.sql("CALL mxw.system.delete_mode('db.dbv', 'vector')")
    // 40% vector debt in p=a only
    spark.sql("DELETE FROM mxw.db.dbv WHERE p = 'a' AND k < 200")
    val before = stampsByDir(t)
    // threshold 20%: p=a (40%) rewrites and materializes its vector,
    // p=b (0%) never listed
    val r = spark.sql(
      "CALL mxw.system.compact_debt('db.dbv', 512, 20, 99)").head()
    assert(r.getLong(0) === 1L)
    val after = stampsByDir(t)
    assert(after("p=b") === before("p=b"))
    assert(after("p=a") !== before("p=a"))
    val (fs, _) = ColeIO.resolve(t, ColeIO.driverConf())
    assert(!ColeIO.listPartitioned(t, ColeIO.driverConf()).exists { case (st, _) =>
      fs.exists(new org.apache.hadoop.fs.Path(
        ColeDv.sidecarPath(st.getPath.toString))) },
      "compacting the debtor must materialize its vector")
    assert(spark.read.format("cole").load(t).count() === 800L)
    // below both thresholds now: a second run touches nothing
    val r2 = spark.sql(
      "CALL mxw.system.compact_debt('db.dbv', 512, 20, 99)").head()
    assert(r2.getLong(0) === 0L)
    assert(stampsByDir(t) === after)
  }
}
