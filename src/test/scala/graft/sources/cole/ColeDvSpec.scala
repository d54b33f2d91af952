package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read DELETE via deletion vectors (ColeDv): with
  * `delete_mode='vector'`, a DELETE writes per-file sidecars of deleted
  * row ordinals and every scan subtracts them — data files stay
  * byte-identical (deleting 100 rows from a 100 TB table costs KB of
  * sidecar writes), compaction materializes. Aggregate pushdown stays ON
  * (r10): COUNT answers metadata-exact (planned rows minus vector
  * counts), value sweeps mask with the vector; the remaining count-exact
  * fast paths (LIMIT truncation, TopN pruning, CBO stats) decline while
  * vectors can exist.
  */
class ColeDvSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_dv_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.dvw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.dvw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def fileStamps(dir: String): Set[(String, Long, Long)] =
    ColeIO.listPartitioned(dir, conf).map { case (st, _) =>
      (st.getPath.toString, st.getLen, st.getModificationTime)
    }.toSet

  private def sidecars(dir: String): Seq[String] = {
    val (fs, _) = ColeIO.resolve(dir, conf)
    ColeIO.listPartitioned(dir, conf).map(_._1.getPath.toString)
      .filter(f => fs.exists(new org.apache.hadoop.fs.Path(
        ColeDv.sidecarPath(f))))
  }

  test("vector DELETE: data files byte-identical, reads exact, aggregates push masked") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/v"
    (0 until 4000).map(i => (i.toLong, (i % 7).toLong, s"t$i"))
      .toDF("k", "g", "tag").coalesce(2)
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(t)
    spark.sql("CALL dvw.system.delete_mode('db.v', 'vector')")
    val before = fileStamps(t)
    spark.sql("DELETE FROM dvw.db.v WHERE k >= 1000 AND k < 1500")
    assert(fileStamps(t) === before,
      "vector DELETE must leave every data file byte-identical")
    assert(sidecars(t).nonEmpty, "affected files must carry .dv sidecars")
    val back = spark.table("dvw.db.v")
    assert(back.count() === 3500L)
    assert(back.filter(col("k") === 1200L).count() === 0L)
    assert(back.filter(col("k") === 999L).count() === 1L)
    // claimed filters compose with the vector
    assert(back.filter(col("k") < 2000L).count() === 1500L)
    // aggregates PUSH and stay exact (r10): the vector rides the
    // InputPartition, COUNT subtracts it, min/max/sum sweep masked —
    // a stat-answered min/max would otherwise name the deleted k=1000
    val agg = back.agg(count(lit(1)).as("c"), sum("k").as("s"),
      min("k").as("mn"), max("k").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "vector mode must keep aggregate pushdown (vector-masked sweeps)")
    val r = agg.head()
    assert(r.getLong(0) === 3500L)
    assert(r.getLong(1) === (0L until 4000L).sum - (1000L until 1500L).sum)
    assert(r.getLong(2) === 0L && r.getLong(3) === 3999L)
    // the metadata-exact shape: a global unfiltered COUNT(*) pushes as
    // footer rows MINUS vector counts, zero data bytes
    val cnt = back.groupBy().count()
    assert(cnt.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "global COUNT(*) must stay metadata-only on a vectored table")
    assert(cnt.head.getLong(0) === 3500L)
    // grouped + filtered aggregates push and mask too (min of group g=6
    // inside the deleted band moves: 1000+? — exactness is the point)
    val ga = back.filter(col("k") >= 500L).groupBy("g")
      .agg(count(lit(1)).as("c"), sum("k").as("s"), min("k").as("mn"))
    assert(ga.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "grouped filtered aggregate must push on a vectored table")
    val live = (500 until 4000).filterNot(k => k >= 1000 && k < 1500)
    val exp = live.groupBy(_ % 7).view.mapValues(ks =>
      (ks.size.toLong, ks.map(_.toLong).sum, ks.min.toLong)).toMap
    ga.collect().foreach { row =>
      val (c, s2, mn) = exp(row.getLong(0).toInt)
      assert(row.getLong(1) === c && row.getLong(2) === s2 && row.getLong(3) === mn)
    }
    // $files surfaces the vector debt per file
    val filesMeta = spark.sql(
      "SELECT deleted_rows, live_rows, row_count FROM dvw.db.`v$files`")
      .collect()
    assert(filesMeta.map(_.getLong(0)).sum === 500L)
    assert(filesMeta.map(_.getLong(1)).sum === 3500L)
    assert(filesMeta.map(_.getLong(2)).sum === 4000L)
    // LIMIT and TopN stay exact (r10: their pruning is back ON under
    // vectors — credits count LIVE rows, stats stay physical)
    assert(back.orderBy(col("k")).limit(3).collect().map(_.getLong(0)).toSeq
      === Seq(0L, 1L, 2L))
    assert(back.orderBy(col("k").desc).limit(1).head.getLong(0) === 3999L)
    assert(back.filter(col("k") >= 998L).orderBy("k").limit(4)
      .collect().map(_.getLong(0)).toSeq === Seq(998L, 999L, 1500L, 1501L))
  }

  test("LIMIT and TopN boundaries under vectors: dead prefixes and deleted extremes") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/lt"
    (0 until 4000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "256").save(t)
    spark.sql("CALL dvw.system.delete_mode('db.lt', 'vector')")
    // kill the whole PREFIX (first row groups fully dead) and the
    // physical MAX (the top-1 desc stat threshold names a deleted row)
    spark.sql("DELETE FROM dvw.db.lt WHERE k < 1000 OR k >= 3995")
    val back = spark.table("dvw.db.lt")
    // LIMIT planning truncates by LIVE counts: the dead prefix cannot
    // satisfy it, rows must come from the live middle
    assert(back.limit(5).collect().map(_.getLong(0)).forall(k =>
      k >= 1000L && k < 3995L))
    assert(back.orderBy("k").limit(3).collect().map(_.getLong(0)).toSeq
      === Seq(1000L, 1001L, 1002L))
    // TopN desc: the physical max (3999) is deleted — the credit counts
    // live rows only and the result is the top LIVE value
    assert(back.orderBy(col("k").desc).limit(2).collect()
      .map(_.getLong(0)).toSeq === Seq(3994L, 3993L))
    // filtered TopN composes with the vector
    assert(back.filter(col("k") >= 990L).orderBy("k").limit(2).collect()
      .map(_.getLong(0)).toSeq === Seq(1000L, 1001L))
    // AQE/CBO row estimate is live-exact
    val stats = back.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.computeStats().rowCount
    }.head
    assert(stats.contains(BigInt(4000 - 1000 - 5)),
      s"scan row estimate must subtract vector counts, got $stats")
  }

  test("repeat DELETEs merge; a fully-matched re-run writes nothing") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/m"
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvw.system.delete_mode('db.m', 'vector')")
    spark.sql("DELETE FROM dvw.db.m WHERE k < 100")
    spark.sql("DELETE FROM dvw.db.m WHERE k >= 50 AND k < 150") // overlaps
    assert(spark.table("dvw.db.m").count() === 850L)
    assert(spark.table("dvw.db.m").agg(min("k")).head.getLong(0) === 150L)
    // re-running a fully-covered DELETE adds no ordinals: sidecar untouched
    val (fs, _) = ColeIO.resolve(t, conf)
    val sc0 = sidecars(t).head
    val p = new org.apache.hadoop.fs.Path(ColeDv.sidecarPath(sc0))
    val m0 = fs.getFileStatus(p).getModificationTime
    spark.sql("DELETE FROM dvw.db.m WHERE k < 150")
    assert(fs.getFileStatus(p).getModificationTime === m0,
      "a DELETE whose rows are already deleted must not rewrite the vector")
    assert(spark.table("dvw.db.m").count() === 850L)
  }

  test("fully-deleted files are skipped whole at planning") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/f"
    // two files with disjoint ranges
    (0 until 2).foreach { part =>
      (part * 500 until (part + 1) * 500).map(i => (i.toLong, i.toLong))
        .toDF("k", "v").coalesce(1)
        .write.format("cole").mode(if (part == 0) "overwrite" else "append").save(t)
    }
    spark.sql("CALL dvw.system.delete_mode('db.f', 'vector')")
    spark.sql("DELETE FROM dvw.db.f WHERE k < 500") // kills file A entirely
    assert(fileStamps(t).size === 2, "dead file lingers until compaction")
    ColeIO.opens.set(0)
    assert(spark.table("dvw.db.f").count() === 500L)
    // planning must not open the dead file's data
    assert(spark.table("dvw.db.f").filter(col("k") === 10L).count() === 0L)
  }

  test("UPDATE on a vectored table runs merge-on-read: old file byte-identical") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/u"
    (0 until 1000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvw.system.delete_mode('db.u', 'vector')")
    spark.sql("DELETE FROM dvw.db.u WHERE k < 100")
    assert(sidecars(t).size === 1)
    val before = fileStamps(t)
    // merge-on-read UPDATE (SupportsDelta): the matched rows' ids vector
    // away, the new images land in a NEW file — the original data file
    // stays byte-identical
    spark.sql("UPDATE dvw.db.u SET v = v + 1000000 WHERE k >= 900")
    assert((before -- fileStamps(t)).isEmpty,
      "merge-on-read UPDATE must not rewrite or remove the original file")
    assert(fileStamps(t).size === before.size + 1,
      "updated images must land in one new file")
    val back = spark.table("dvw.db.u")
    assert(back.count() === 900L)
    assert(back.filter(col("k") === 50L).count() === 0L,
      "deleted rows must not resurrect through the update")
    assert(back.filter(col("k") === 950L).select("v").head.getLong(0) === 1000950L)
    assert(back.filter(col("k") === 500L).select("v").head.getLong(0) === 500L)
    // no duplicate images: the old rows are in the vector
    assert(back.groupBy("k").count().filter(col("count") > 1).count() === 0L)
    // compaction still materializes everything
    ColeCompact.compact(s, t, 512L << 20)
    assert(sidecars(t).isEmpty)
    assert(spark.table("dvw.db.u").count() === 900L)
  }

  test("compaction materializes vectors; delete_mode can then revert to copy") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/c"
    (0 until 2000).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(4)
      .write.format("cole").mode("overwrite").option("rowGroupSize", "256").save(t)
    spark.sql("CALL dvw.system.delete_mode('db.c', 'vector')")
    // convertible condition: the vector fast path serves it (a
    // non-convertible one routes to the copy-on-write group rewrite,
    // which clears vectors as it goes)
    spark.sql("DELETE FROM dvw.db.c WHERE k >= 300 AND k < 966")
    val expect = 2000L - 666L
    assert(spark.table("dvw.db.c").count() === expect)
    assert(sidecars(t).nonEmpty)
    // copy mode refuses while vectors are live
    val e = intercept[Exception] {
      spark.sql("CALL dvw.system.delete_mode('db.c', 'copy')").collect()
    }
    assert(e.getMessage.contains("deletion vectors"))
    ColeCompact.compact(s, t, 512L << 20)
    assert(sidecars(t).isEmpty, "compaction must clear the vectors")
    assert(spark.table("dvw.db.c").count() === expect)
    spark.sql("CALL dvw.system.delete_mode('db.c', 'copy')")
    // pushdown returns with copy mode and no vectors
    val agg = spark.table("dvw.db.c").agg(sum("v"))
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(agg.head.getLong(0) ===
      (0L until 2000L).filterNot(k => k >= 300L && k < 966L).sum)
  }

  test("compaction materializes vectors even in already-small directories") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/c1"
    (0 until 500).map(i => (i.toLong, i.toLong)).toDF("k", "v").coalesce(1)
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL dvw.system.delete_mode('db.c1', 'vector')")
    spark.sql("DELETE FROM dvw.db.c1 WHERE k < 200")
    assert(sidecars(t).size === 1)
    // one file, already under target size — compaction must STILL
    // rewrite it (it is what materializes the vector)
    ColeCompact.compact(s, t, 512L << 20)
    assert(sidecars(t).isEmpty)
    assert(spark.table("dvw.db.c1").count() === 300L)
    spark.sql("CALL dvw.system.delete_mode('db.c1', 'copy')")
  }

  test("vector mode and versioning compose, both enablement orders (r10)") {
    val s = spark
    import s.implicits._
    // versioning first, vector mode second
    val t = s"$warehouse/db/x"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(t)
    ColeVersions.enable(t, conf)
    spark.sql("CALL dvw.system.delete_mode('db.x', 'vector')")
    spark.sql("DELETE FROM dvw.db.x WHERE k < 10")
    assert(spark.table("dvw.db.x").count() === 90L)
    assert(spark.read.format("cole").option("versionAsOf", "1").load(t)
      .count() === 100L)
    // vector mode first, versioning second (ColeDvVersionsSpec covers
    // the baseline-pins-existing-vectors depth)
    val t2 = s"$warehouse/db/x2"
    (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(t2)
    spark.sql("CALL dvw.system.delete_mode('db.x2', 'vector')")
    ColeVersions.enable(t2, conf)
    spark.sql("DELETE FROM dvw.db.x2 WHERE k < 20")
    assert(spark.table("dvw.db.x2").count() === 80L)
    assert(spark.read.format("cole").option("versionAsOf", "1").load(t2)
      .count() === 100L)
  }

  test("partitioned and bucketed layouts: vector DELETE stays exact") {
    val s = spark
    import s.implicits._
    val tp = s"$warehouse/db/p"
    (0 until 1200).map(i => (i.toLong, (i % 3).toString, i.toLong))
      .toDF("k", "part", "v")
      .write.format("cole").mode("overwrite").partitionBy("part").save(tp)
    spark.sql("CALL dvw.system.delete_mode('db.p', 'vector')")
    spark.sql("DELETE FROM dvw.db.p WHERE part = '1' AND k < 600")
    assert(spark.table("dvw.db.p").count() ===
      1200L - (0 until 600).count(_ % 3 == 1))
    assert(spark.table("dvw.db.p").filter(col("part") === "1").count() ===
      (600 until 1200).count(_ % 3 == 1).toLong)
    // a DIRECT read of the partition subdirectory must still apply the
    // vectors (the mode marker is at the table root — the fuzz caught a
    // compaction path resurrecting deleted rows through exactly this)
    assert(spark.read.format("cole").load(s"$tp/part=1").count() ===
      (600 until 1200).count(_ % 3 == 1).toLong)
    val tb = s"$warehouse/db/b"
    (0 until 1600).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(tb)
    spark.sql("CALL dvw.system.delete_mode('db.b', 'vector')")
    val before = fileStamps(tb)
    spark.sql("DELETE FROM dvw.db.b WHERE k IN (7, 177, 533, 1201, 1599)")
    assert(fileStamps(tb) === before)
    assert(spark.table("dvw.db.b").count() === 1595L)
    // bucket point lookup still prunes AND respects the vector
    assert(spark.table("dvw.db.b").filter(col("k") === 7L).count() === 0L)
    assert(spark.table("dvw.db.b").filter(col("k") === 8L).count() === 1L)
  }
}
