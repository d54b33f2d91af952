package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Time-travel pruning parity (r9): a pinned `versionAsOf` read must
  * keep the connector's planning levers instead of degrading to a flat
  * scan — bucket pruning and aggregate pushdown resolve the bucket
  * sidecar AS OF the version from the commit log (each record snapshots
  * the `_bucketspec` content), so a pinned long-running query on a
  * bucketed 100 TB table reads 1/n of the directories exactly like the
  * live table does.
  */
class ColeTimeTravelPruningSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def conf = ColeIO.driverConf()

  test("bucket point-lookup at versionAsOf opens no more files than live") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_ttprune").toString
    (0 until 8000).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .repartition(4).write.format("cole").mode("overwrite")
      .option("bucketBy", "8:k").save(dir)
    ColeVersions.enable(dir, conf) // v1: baseline records the spec
    (8000 until 12000).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .repartition(2).write.format("cole").mode("append")
      .option("bucketBy", "8:k").save(dir) // v2
    val files = ColeIO.listPartitioned(dir, conf)
    val totalFiles = files.size
    val bucketOfKey = ColeBucket.bucketOf(4242L, 8).toString
    val inBucketLive = files.count(_._2.toMap
      .get(ColeBucket.DirKey).contains(bucketOfKey))
    assert(totalFiles > inBucketLive, "fixture must have >1 bucket populated")

    def lookup(df: org.apache.spark.sql.DataFrame): Long = {
      ColeIO.opens.set(0)
      val r = df.filter(col("k") === 4242L).agg(sum("v")).head().getLong(0)
      r
    }
    // live lookup: pruned to the key's bucket
    val live = spark.read.format("cole").load(dir)
    val liveSum = lookup(live)
    val liveOpens = ColeIO.opens.get()
    assert(liveOpens <= inBucketLive,
      s"live lookup opened $liveOpens files, bucket holds $inBucketLive")
    // pinned lookup: SAME pruning discipline over the snapshot file set
    val v1 = spark.read.format("cole").option("versionAsOf", "1").load(dir)
    val v1Sum = lookup(v1)
    val v1Opens = ColeIO.opens.get()
    assert(v1Sum === liveSum) // key 4242 existed at v1, value unchanged
    assert(v1Opens <= liveOpens,
      s"versionAsOf 1 lookup opened $v1Opens files; live opened $liveOpens — " +
        "the snapshot read lost bucket pruning")
    // and the snapshot answers from ITS file set: appended keys absent
    assert(v1.filter(col("k") === 9000L).count() === 0)
    assert(live.filter(col("k") === 9000L).count() === 1)
  }

  test("aggregate pushdown stays ON for versionAsOf reads, values as of the version") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_ttagg").toString
    (0 until 5000).map(i => (i.toLong, (i % 10).toString, i.toLong))
      .toDF("k", "g", "v").coalesce(2)
      .write.format("cole").mode("overwrite").save(dir)
    ColeVersions.enable(dir, conf) // v1
    (5000 until 7000).map(i => (i.toLong, (i % 10).toString, i.toLong))
      .toDF("k", "g", "v").coalesce(1)
      .write.format("cole").mode("append").save(dir) // v2
    val v1 = spark.read.format("cole").option("versionAsOf", "1").load(dir)
    val q = v1.agg(count(lit(1)).as("n"), sum("v").as("s"),
      min("v").as("mn"), max("v").as("mx"))
    assert(q.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "snapshot reads must keep aggregate pushdown")
    val r = q.head()
    assert(r.getLong(0) === 5000L)
    assert(r.getLong(1) === (0L until 5000L).sum)
    assert(r.getLong(3) === 4999L)
    // grouped pushdown over the snapshot too
    val g = v1.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(g.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(g.collect().map(_.getLong(2)).sum === (0L until 5000L).sum)
    // live reads see v2 (sanity that the pin is real)
    assert(spark.read.format("cole").load(dir).count() === 7000L)
  }

  test("a pre-r9 log (no recorded spec) plans flat: correct, no pruning claims") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_ttold").toString
    (0 until 2000).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .repartition(2).write.format("cole").mode("overwrite")
      .option("bucketBy", "4:k").save(dir)
    ColeVersions.enable(dir, conf)
    // strip the recorded spec lines, simulating a log written before
    // specs were recorded — resolution must fall back to NO bucket
    // features, never trust the live sidecar for a pinned version
    val (fs, _) = ColeIO.resolve(dir, conf)
    val vd = new org.apache.hadoop.fs.Path(dir, ColeVersions.DirName)
    fs.listStatus(vd).filter(_.isFile).foreach { st =>
      val in = fs.open(st.getPath)
      val txt = try new String(in.readAllBytes()) finally in.close()
      val stripped = txt.split('\n').filterNot(_.startsWith("spec:")).mkString("\n")
      fs.delete(st.getPath, false)
      val out = fs.create(st.getPath, false)
      try out.write(stripped.getBytes) finally out.close()
    }
    ColeVersions.invalidateCache(fs, dir)
    val v1 = spark.read.format("cole").option("versionAsOf", "1").load(dir)
    assert(v1.count() === 2000L)
    assert(v1.filter(col("k") === 77L).count() === 1L)
  }
}
