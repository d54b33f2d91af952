package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `option("sortBy", "k")` (r11): opt-in in-partition ordering for
  * non-bucketed writes — each emitted file lands SORTED on the key, so
  * DELTA encodings and tight page stats let range predicates prune row
  * groups inside every file (the `bucketBy().sortBy()` benefit without
  * buckets). Per-write option: no layout state, appends unaffected.
  */
class ColeSortByWriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
  }

  private def conf = ColeIO.driverConf()

  test("sorted writes land per-file-sorted files and range predicates prune row groups") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_sortby").toString + "/t"
    val rnd = new scala.util.Random(7)
    // adversarially shuffled input
    rnd.shuffle((0 until 20000).toVector).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v").repartition(2)
      .write.format("cole").mode("overwrite")
      .option("sortBy", "k").option("rowGroupSize", "1000").save(dir)
    val cole = s.read.format("cole").load(dir)
    // every file is internally sorted on k
    val perFile = cole.select(col("_cole_file"), col("k")).collect()
      .groupBy(_.getString(0)).values
    perFile.foreach { rows =>
      val ks = rows.map(_.getLong(1))
      assert(ks.sameElements(ks.sorted), "file not sorted on k")
    }
    // a narrow range plans a narrow row-group slice
    val b = new ColeScanBuilder(cole.schema, dir, conf)
    b.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 5000L),
      org.apache.spark.sql.sources.LessThan("k", 6000L)))
    val planned = b.build().asInstanceOf[ColeScan].planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    // 20k rows / 1k per group = 20 groups; the 1k range touches ~1 group
    // per task file (+ boundary) — far fewer than all of them
    assert(planned <= 4, s"sorted layout planned $planned row groups")
    assert(cole.filter(col("k") >= 5000L && col("k") < 6000L).count() == 1000)
  }

  test("sortBy composes with temporal partitioning: sorted files inside day directories") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_sortby_t").toString + "/t"
    val base = java.time.Instant.parse("2024-05-01T00:00:00Z")
    val rnd = new scala.util.Random(11)
    rnd.shuffle((0 until 4000).toVector).map(i => (i.toLong,
        java.sql.Timestamp.from(base.plusSeconds((i % 4) * 86400L + i))))
      .toDF("k", "ts").repartition(2)
      .write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "days:ts")
      .option("sortBy", "k").option("rowGroupSize", "500").save(dir)
    val cole = s.read.format("cole").load(dir)
    assert(cole.count() == 4000)
    val perFile = cole.select(col("_cole_file"), col("k")).collect()
      .groupBy(_.getString(0))
    assert(perFile.keySet.forall(_.contains("_t_days_ts=")))
    perFile.values.foreach { rows =>
      val ks = rows.map(_.getLong(1))
      assert(ks.sameElements(ks.sorted), "day file not sorted on k")
    }
    // bucketed writes own their ordering: sortBy there is rejected
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("k", "v").write.format("cole").mode("overwrite")
        .option("bucketBy", "4:k").option("sortBy", "v")
        .save(dir + "_b")
    }
    assert(e.getMessage.contains("drop sortBy"), e.getMessage)
  }
}
