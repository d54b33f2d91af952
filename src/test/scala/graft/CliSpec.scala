package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference CLI grammar (write/scan/query --select/--where/--agg/
  * --groupby) must behave like the equivalent DataFrame plans, including
  * against the fixture file written by the reference C++ engine itself.
  */
class CliSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val fixture = getClass.getResource("/ref_fixture.col").getPath

  test("query --where --agg on the reference fixture matches DataFrame math") {
    val out = Cli.buildQuery(spark, fixture,
      Array("--where", "value", "gt", "5000", "--agg", "sum", "value")).head()
    val exp = spark.read.format("cole").load(fixture)
      .filter(col("value") > 5000)
      .agg(count(lit(1)), sum("value")).head()
    assert(out.getLong(0) === exp.getLong(0))
    assert(out.getLong(1) === exp.getLong(1))
  }

  test("query --groupby reports count+sum per group like the reference") {
    val rows = Cli.buildQuery(spark, fixture,
      Array("--groupby", "region", "--agg", "sum", "value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exp = spark.read.format("cole").load(fixture)
      .groupBy("region").agg(count(lit(1)).as("c"), sum("value").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows === exp)
  }

  test("query --select projects and chained --where filters conjunctively") {
    val df = Cli.buildQuery(spark, fixture, Array(
      "--select", "id,value,category",
      "--where", "value", "ge", "1000",
      "--where", "value", "lt", "2000",
      "--where", "category", "eq", "3"))
    assert(df.columns.toSeq === Seq("id", "value", "category"))
    val vals = df.select("value", "category").collect()
    assert(vals.nonEmpty)
    assert(vals.forall(r => r.getLong(0) >= 1000 && r.getLong(0) < 2000 && r.getInt(1) == 3))
  }

  test("write generates the reference schema shape; scan reports it") {
    val dir = Files.createTempDirectory("cli_write").toString
    Cli.write(spark, dir, 5000L, seed = 7L)
    val df = spark.read.format("cole").load(dir)
    assert(df.columns.toSeq === Seq("id", "value", "category", "region", "status"))
    assert(df.count() === 5000)
    assert(df.agg(min("id"), max("id")).head() match {
      case r => r.getLong(0) == 0L && r.getLong(1) == 4999L
    })
    val cats = df.select("category").distinct().collect().map(_.getInt(0)).sorted
    assert(cats.toSeq === Seq(1, 2, 3, 4, 5))
    val scan = Cli.scanText(spark, dir)
    assert(scan.exists(_.startsWith("Total rows: ")))
    assert(scan.exists(_.contains("id:INT64")))
  }
}
