package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

final case class BrRow(id: Long, grp: String, v: Long)

/** Streaming writes onto a WAP branch (r16, verdict ask #4): a streaming
  * ingest can be staged, audited and published exactly like a batch one.
  * Pinned here:
  *   - epochs land under the branch staging root with branch-local
  *     `append` records: INVISIBLE on main (file set byte-identical, no
  *     version advance, no manifest entry), visible on the branch read;
  *   - fast_forward publishes all staged epochs in ONE main commit;
  *   - replay idempotence is preserved: re-committing an epoch's files
  *     and re-recording its rels converge (epoch-deterministic names +
  *     set-fold records) — the staged file count never grows;
  *   - a branch stream cannot declare a NEW layout (loud);
  *   - dropping the branch discards the streamed epochs.
  */
class ColeStreamBranchSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_sbr_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.sbr", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.sbr.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def fileState(t: String): Map[String, (Long, Long)] =
    ColeIO.listPartitioned(t, conf).map { case (st, _) =>
      st.getPath.toString -> (st.getLen, st.getModificationTime)
    }.toMap

  test("stream → branch: invisible on main, audited, published in one commit") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/ing"
    (0 until 50).map(i => BrRow(i.toLong, s"g${i % 3}", i.toLong)).toDF()
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL sbr.system.versioning('db.ing')")
    spark.sql("CALL sbr.system.create_branch('db.ing', 'stream')")
    val mainBefore = fileState(t)
    val vBefore = ColeVersions.currentVersion(t, conf)

    val cp = Files.createTempDirectory("cole_sbr_cp").toString
    val source = MemoryStream[BrRow](spark)
    val q = source.toDF().writeStream.format("cole")
      .option("path", t).option("checkpointLocation", cp)
      .option("branch", "stream")
      .outputMode(OutputMode.Append).start()
    source.addData((50 until 120).map(i => BrRow(i.toLong, s"g${i % 3}", i.toLong)))
    q.processAllAvailable()
    source.addData((120 until 150).map(i => BrRow(i.toLong, s"g${i % 3}", i.toLong)))
    q.processAllAvailable()
    q.stop()

    // invisible on main: bytes, version, row count all unchanged
    assert(fileState(t) === mainBefore, "a branch stream touched main")
    assert(ColeVersions.currentVersion(t, conf) === vBefore)
    assert(spark.table("sbr.db.ing").count() === 50L)
    // no manifest entries for staged epochs (tailing sources stay blind)
    assert(!new java.io.File(t, ColeStreamingWrite.ManifestDirName).exists(),
      "branch epochs leaked into the tailing manifest")
    // the audit read: branch serves fork + both streamed epochs
    val br = spark.read.format("cole").option("branch", "stream").load(t)
    assert(br.count() === 150L)
    assert(br.agg(sum("v")).head().getLong(0) === (0L until 150L).sum)
    val stagedBefore = ColeRefs.branches(t, conf)
      .find(_.name == "stream").get.stagedFiles

    // publish: one main commit carries every staged epoch
    spark.sql("CALL sbr.system.fast_forward('db.ing', 'stream')")
    assert(ColeVersions.currentVersion(t, conf) === vBefore + 1)
    val main = spark.table("sbr.db.ing")
    assert(main.count() === 150L)
    assert(main.agg(sum("v")).head().getLong(0) === (0L until 150L).sum)
    assert(main.filter(col("id") >= 120L).count() === 30L)
    assert(stagedBefore > 0)
  }

  test("replay idempotence: a re-run epoch converges instead of duplicating") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rep"
    (0 until 20).map(i => BrRow(i.toLong, "g", i.toLong)).toDF()
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL sbr.system.versioning('db.rep')")
    spark.sql("CALL sbr.system.create_branch('db.rep', 'b')")
    // same data through TWO fresh checkpoints: epoch 0 runs twice (the
    // crashed-before-checkpoint shape) — deterministic names + set-fold
    // records must converge, not duplicate
    def runEpoch0(): Unit = {
      val cp = Files.createTempDirectory("cole_sbr_rep_cp").toString
      val source = MemoryStream[BrRow](spark)
      val q = source.toDF().writeStream.format("cole")
        .option("path", t).option("checkpointLocation", cp)
        .option("branch", "b")
        .outputMode(OutputMode.Append).start()
      source.addData((20 until 40).map(i => BrRow(i.toLong, "g", i.toLong)))
      q.processAllAvailable()
      q.stop()
    }
    runEpoch0()
    val stagedAfterFirst = ColeRefs.branches(t, conf)
      .find(_.name == "b").get.stagedFiles
    runEpoch0()
    val stagedAfterReplay = ColeRefs.branches(t, conf)
      .find(_.name == "b").get.stagedFiles
    assert(stagedAfterReplay === stagedAfterFirst,
      "a replayed epoch grew the staged file set")
    val br = spark.read.format("cole").option("branch", "b").load(t)
    assert(br.count() === 40L, s"replayed epoch duplicated rows")
    spark.sql("CALL sbr.system.drop_branch('db.rep', 'b')")
    assert(spark.table("sbr.db.rep").count() === 20L)
    assert(spark.read.format("cole").load(t).count() === 20L)
  }

  test("the WAP session conf routes a stream to the branch like a batch append") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/cnf"
    (0 until 30).map(i => BrRow(i.toLong, "g", i.toLong)).toDF()
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL sbr.system.versioning('db.cnf')")
    spark.sql("CALL sbr.system.create_branch('db.cnf', 'w')")
    val vBefore = ColeVersions.currentVersion(t, conf)
    spark.conf.set(ColeRefs.WapBranchConfKey, "w")
    try {
      val cp = Files.createTempDirectory("cole_sbr_cnf_cp").toString
      val source = MemoryStream[BrRow](spark)
      val q = source.toDF().writeStream.format("cole")
        .option("path", t).option("checkpointLocation", cp)
        .outputMode(OutputMode.Append).start() // no branch option: the conf routes
      source.addData((30 until 50).map(i => BrRow(i.toLong, "g", i.toLong)))
      q.processAllAvailable()
      q.stop()
    } finally spark.conf.unset(ColeRefs.WapBranchConfKey)
    assert(ColeVersions.currentVersion(t, conf) === vBefore,
      "conf-routed stream committed to main")
    assert(spark.read.format("cole").load(t).count() === 30L)
    assert(spark.read.format("cole").option("branch", "w").load(t)
      .count() === 50L)
    spark.sql("CALL sbr.system.fast_forward('db.cnf', 'w')")
    assert(spark.read.format("cole").load(t).count() === 50L)
  }

  test("a branch stream cannot declare a NEW layout") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/lay"
    (0 until 10).map(i => BrRow(i.toLong, "g", i.toLong)).toDF()
      .write.format("cole").mode("overwrite").save(t)
    spark.sql("CALL sbr.system.versioning('db.lay')")
    spark.sql("CALL sbr.system.create_branch('db.lay', 'b')")
    val cp = Files.createTempDirectory("cole_sbr_lay_cp").toString
    val source = MemoryStream[BrRow](spark)
    val q = source.toDF().writeStream.format("cole")
      .option("path", t).option("checkpointLocation", cp)
      .option("branch", "b").option("bucketBy", "4:id")
      .outputMode(OutputMode.Append).start()
    source.addData(Seq(BrRow(11L, "g", 11L)))
    val e = intercept[Exception] { q.processAllAvailable(); q.stop() }
    assert(e.getMessage.contains("NEW bucket layout"), s"got: ${e.getMessage}")
    try q.stop() catch { case _: Exception => () }
  }
}
