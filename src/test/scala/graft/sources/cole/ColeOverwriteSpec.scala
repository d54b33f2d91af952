package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-scoped OVERWRITE on `.col` tables — the daily-reload shape a
  * warehouse actually runs: replace yesterday's partition, touch nothing
  * else. Dynamic (`overwritePartitions()` — replace whatever partitions
  * the incoming data lands in) and static (`INSERT OVERWRITE ...
  * PARTITION (p=…)` — an explicit partition predicate) both rewrite at
  * partition granularity; row-level conditions are rejected loudly.
  */
class ColeOverwriteSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_ow_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.owh", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.owh.warehouse", warehouse)
    s
  }

  private def seed(table: String): Unit = {
    val s = spark
    import s.implicits._
    (0 until 400).map(i => (i.toLong, i % 4, s"old$i"))
      .toDF("id", "p", "t")
      .write.format("cole").mode("overwrite").partitionBy("p")
      .save(s"$warehouse/$table")
  }

  test("dynamic overwrite replaces exactly the partitions new data lands in") {
    val s = spark
    import s.implicits._
    seed("dyn")
    // new data touches partitions 1 and 3 only
    (0 until 60).map(i => (10000L + i, if (i % 2 == 0) 1 else 3, s"new$i"))
      .toDF("id", "p", "t")
      .writeTo("owh.dyn").overwritePartitions()
    val by = spark.table("owh.dyn").groupBy("p")
      .agg(count(lit(1)).as("n"), min("id").as("mn")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(by(0) === ((100L, 0L)), "partition 0 must be untouched")
    assert(by(2) === ((100L, 2L)), "partition 2 must be untouched")
    assert(by(1) === ((30L, 10000L)), "partition 1 must hold ONLY the new rows")
    assert(by(3) === ((30L, 10001L)), "partition 3 must hold ONLY the new rows")
  }

  test("INSERT OVERWRITE with a static partition spec replaces only that partition") {
    seed("stat")
    spark.sql(
      "INSERT OVERWRITE owh.stat PARTITION (p = 2) VALUES (90001, 'x1'), (90002, 'x2')")
    val by = spark.table("owh.stat").groupBy("p").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(by === Map(0 -> 100L, 1 -> 100L, 2 -> 2L, 3 -> 100L))
    val ids = spark.table("owh.stat").filter(col("p") === 2)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(90001L, 90002L))
  }

  test("dynamic overwrite replays partition-idempotently (second run same result)") {
    val s = spark
    import s.implicits._
    seed("rep")
    def run(): Unit = (0 until 20).map(i => (20000L + i, 1, s"r$i"))
      .toDF("id", "p", "t").writeTo("owh.rep").overwritePartitions()
    run(); run()
    val by = spark.table("owh.rep").groupBy("p").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(by === Map(0 -> 100L, 1 -> 20L, 2 -> 100L, 3 -> 100L),
      "a repeated dynamic overwrite must not duplicate or leak rows")
  }

  test("row-level overwrite conditions are rejected loudly") {
    seed("rowlvl")
    val e = intercept[Exception] {
      // static mode with no partition spec = truncate-all, allowed; a
      // row-level predicate is the rejected shape:
      new ColeWriteBuilder(spark.table("owh.rowlvl").schema,
        s"$warehouse/rowlvl", 65536, ColeIO.driverConf(), Seq("p"))
        .overwrite(Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.GreaterThan("id", 5L)))
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
  }

  test("dynamic overwrite on a bucketed table is rejected") {
    val s = spark
    import s.implicits._
    (0 until 100).map(i => (i.toLong, s"b$i")).toDF("id", "t")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:id")
      .save(s"$warehouse/bkt")
    val e = intercept[Exception] {
      new ColeWriteBuilder(spark.table("owh.bkt").schema, s"$warehouse/bkt",
        65536, ColeIO.driverConf(), Seq.empty, Some((4, Seq("id"))))
        .overwriteDynamicPartitions()
    }
    assert(e.getMessage.contains("bucketed") || e.getMessage.contains("hive-partitioned"),
      e.getMessage)
  }
}
