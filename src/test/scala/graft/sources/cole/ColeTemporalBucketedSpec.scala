package graft.sources.cole

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composed temporal + bucket layouts (r12): `days(ts)` unit directories
  * holding `_bucket=<b>` subdirectories — the standard time-series fact
  * layout (Iceberg's `days(ts), bucket(n, k)`). A ts-range query prunes
  * whole unit directories AND a key-equality predicate prunes buckets
  * inside them; a join on the bucket key plans zero Exchange even under
  * a ts filter, because the scan reports `bucket(n, k)` with the
  * temporal ordinal withdrawn from the claim (partitions of one bucket
  * across days group into one key partition).
  */
class ColeTemporalBucketedSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_tb_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.tbw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.tbw.warehouse", warehouse)
    s
  }

  private def countShuffles(df: DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (if (p.isInstanceOf[ShuffleExchangeLike]) 1 else 0) +
        p.children.map(walk).sum +
        p.subqueries.map(walk).sum +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ => 0
        })
    walk(df.queryExecution.executedPlan)
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 20 days x 1000 rows/day, keys 0..499 recur daily. Day d, row i:
    * ts = 2024-01-(1+d) at second i, key = i % 500.
    */
  private def makeRows(days: Int, perDay: Int) = {
    val s = spark
    import s.implicits._
    (0 until days * perDay).map { j =>
      val d = j / perDay
      val i = j % perDay
      (j.toLong, new Timestamp(
        Timestamp.valueOf("2024-01-01 00:00:00").getTime +
          d * 86400000L + i * 1000L),
        (i % 500).toLong, (j % 7).toDouble)
    }.toDF("id", "ts", "key", "v")
  }

  private val DaySecs = 86400L
  private def epochDay(date: String): Long =
    java.time.LocalDate.parse(date).toEpochDay

  private lazy val factDir = s"$warehouse/fact"
  private lazy val dimDir = s"$warehouse/dim"

  private lazy val written: Unit = {
    val s = spark
    import s.implicits._
    makeRows(20, 1000)
      .write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "days:ts")
      .option("bucketBy", "4:key").save(factDir)
    (0 until 500).map(k => (k.toLong, s"g${k % 9}"))
      .toDF("key", "grp")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:key").save(dimDir)
  }

  test("composed layout self-describes and routes rows to (unit, bucket) directories") {
    written
    val conf = ColeIO.driverConf()
    assert(ColeTemporal.readSpec(factDir, conf) ===
      Some(ColeTemporal.Spec("days", "ts")))
    assert(ColeBucket.readSpec(factDir, conf) === Some((4, Seq("key"))))
    val files = ColeIO.listPartitioned(factDir, conf)
    assert(files.nonEmpty)
    // nesting order: unit directory first, bucket inside it
    assert(files.forall(_._2.map(_._1) == Seq("_t_days_ts", "_bucket")))
    // layout keys never surface in the schema
    val df = spark.read.format("cole").load(factDir)
    assert(df.schema.fieldNames.toSeq === Seq("id", "ts", "key", "v"))
    assert(df.count() === 20000)
    // every row sits in the directory its ts ordinal + key hash name
    val spec = ColeTemporal.Spec("days", "ts")
    files.foreach { case (st, parts) =>
      val pv = parts.toMap
      val rows = spark.read.format("cole").load(st.getPath.toString)
        .select("ts", "key").collect()
      rows.foreach { r =>
        val micros = r.getTimestamp(0).getTime * 1000L
        assert(spec.ordinal(micros).toString === pv("_t_days_ts"),
          s"row ts ${r.getTimestamp(0)} in wrong unit dir")
        assert(ColeBucket.bucketOf(r.getLong(1), 4).toString === pv("_bucket"),
          s"row key ${r.getLong(1)} in wrong bucket dir")
      }
    }
  }

  test("ts range AND key equality compose: only touched days x pinned bucket open") {
    written
    val conf = ColeIO.driverConf()
    val files = ColeIO.listPartitioned(factDir, conf)
    val d0 = epochDay("2024-01-05")
    val dEnd = epochDay("2024-01-08") // exclusive
    val key = 123L
    val b = ColeBucket.bucketOf(key, 4)
    val eligible = files.count { case (_, parts) =>
      val pv = parts.toMap
      val ord = pv("_t_days_ts").toLong
      ord >= d0 && ord < dEnd && pv("_bucket") == b.toString
    }
    assert(eligible > 0 && eligible < files.size)
    ColeIO.opens.set(0)
    val got = spark.read.format("cole").load(factDir)
      .filter(col("ts") >= to_timestamp(lit("2024-01-05 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-08 00:00:00")) &&
        col("key") === key)
      .agg(count(lit(1)).as("n"), sum("id").as("s")).head()
    // key 123 occurs twice per day (i=123, i=623) for 3 days
    assert(got.getLong(0) === 6)
    assert(ColeIO.opens.get() <= eligible,
      s"composed prune opened ${ColeIO.opens.get()} files, " +
        s"eligible (3 days x 1 bucket) holds $eligible of ${files.size}")
  }

  test("SPJ on the bucket key under a ts filter: zero Exchange, exact results") {
    written
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val f = spark.table("tbw.fact")
      val dim = spark.table("tbw.dim")
      def q = f.filter(col("ts") >= to_timestamp(lit("2024-01-03 00:00:00")) &&
          col("ts") < to_timestamp(lit("2024-01-06 00:00:00")))
        .join(dim, f("key") === dim("key"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"), max("id").as("mx"))
      assert(countShuffles(q) === 1,
        // the groupBy(grp) aggregation shuffles once; the JOIN must not:
        s"temporal+bucket SPJ join added exchanges:\n${q.queryExecution.executedPlan}")
      def joinOnly = f.filter(
          col("ts") >= to_timestamp(lit("2024-01-03 00:00:00")) &&
          col("ts") < to_timestamp(lit("2024-01-06 00:00:00")))
        .join(dim, f("key") === dim("key"))
        .select(f("key"), col("grp"), col("v"))
      assert(countShuffles(joinOnly) === 0,
        s"temporal+bucket SPJ must leave no exchange:\n${joinOnly.queryExecution.executedPlan}")
      val spj = joinOnly.collect().map(_.toSeq).toSet
      val shuffled = withConf(
        "spark.sql.sources.v2.bucketing.enabled" -> "false") {
        joinOnly.collect().map(_.toSeq).toSet
      }
      assert(spj === shuffled)
      assert(spj.nonEmpty)
    }
  }

  test("appends keep both layouts; DDL composition via PARTITIONED BY (days(ts), bucket(n, key))") {
    val s = spark
    import s.implicits._
    // plain append (no options): both sidecars govern routing
    written
    makeRows(2, 100).withColumn("id", col("id") + 1000000L)
      .write.format("cole").mode("append").save(factDir)
    val conf = ColeIO.driverConf()
    val files = ColeIO.listPartitioned(factDir, conf)
    assert(files.forall(_._2.map(_._1) == Seq("_t_days_ts", "_bucket")))
    assert(spark.read.format("cole").load(factDir).count() === 20200)
    // catalog DDL: both transforms declared at CREATE
    spark.sql(
      """CREATE TABLE tbw.ddl (ev BIGINT, ts TIMESTAMP, k BIGINT)
        |PARTITIONED BY (days(ts), bucket(4, k))""".stripMargin)
    Seq((1L, Timestamp.valueOf("2024-03-01 10:00:00"), 77L),
      (2L, Timestamp.valueOf("2024-03-02 10:00:00"), 78L))
      .toDF("ev", "ts", "k")
      .writeTo("tbw.ddl").append()
    val ddlFiles = ColeIO.listPartitioned(s"$warehouse/ddl", conf)
    assert(ddlFiles.nonEmpty &&
      ddlFiles.forall(_._2.map(_._1) == Seq("_t_days_ts", "_bucket")))
    assert(spark.table("tbw.ddl").count() === 2)
    // a conflicting re-declaration still rejects loudly
    val e = intercept[Exception] {
      makeRows(1, 10).write.format("cole").mode("append")
        .option("partitionByTemporal", "hours:ts").save(factDir)
    }
    assert(e.getMessage.contains("laid out") ||
      e.getMessage.contains("temporal"))
  }

  test("row-level DML re-derives both routes and stays oracle-exact") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/dml"
    makeRows(5, 200)
      .write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "days:ts")
      .option("bucketBy", "4:key").save(t)
    s.sql(s"UPDATE tbw.dml SET v = v + 100 WHERE key = 42")
    val conf = ColeIO.driverConf()
    // rewritten rows still live in (their day, their bucket)
    val spec = ColeTemporal.Spec("days", "ts")
    ColeIO.listPartitioned(t, conf).foreach { case (st, parts) =>
      val pv = parts.toMap
      spark.read.format("cole").load(st.getPath.toString)
        .select("ts", "key").collect().foreach { r =>
          assert(spec.ordinal(r.getTimestamp(0).getTime * 1000L).toString
            === pv("_t_days_ts"))
          assert(ColeBucket.bucketOf(r.getLong(1), 4).toString === pv("_bucket"))
        }
    }
    val got = spark.read.format("cole").load(t)
      .agg(sum("v")).head().getDouble(0)
    val want = makeRows(5, 200)
      .withColumn("v", when(col("key") === 42, col("v") + 100).otherwise(col("v")))
      .agg(sum("v")).head().getDouble(0)
    assert(got === want)
  }
}
