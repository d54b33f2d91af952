package graft.sources.cole

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal partition transforms (r11): `PARTITIONED BY (days(ts))` —
  * the time-series layout. The derived unit-ordinal directory key
  * (`_t_days_ts=<epochDay>`) is pure layout (excluded from the schema,
  * like `_bucket`); the source timestamp stays a stored data column;
  * claimed ts predicates translate into directory pruning at planning
  * (conservative — original predicates stay row-exact); the layout
  * self-describes via `_temporalspec` and survives DML rewrites.
  */
class ColeTemporalPartitionSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_temp_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.tpw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.tpw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  /** 10 days × 20 rows starting 2024-03-01T00:30Z, one row per ~hour. */
  private def fill(table: String): Unit = {
    val s = spark
    import s.implicits._
    val base = Instant.parse("2024-03-01T00:30:00Z")
    (0 until 200).map { i =>
      (i.toLong, java.sql.Timestamp.from(
        base.plusSeconds((i / 20) * 86400L + (i % 20) * 3600L)), i % 7)
    }.toDF("id", "ts", "v").repartition(2)
      .writeTo(table).append()
  }

  test("days(ts) routes rows to unit directories; the derived key is layout, not schema") {
    val s = spark
    s.sql("CREATE TABLE tpw.db.ev (id BIGINT, ts TIMESTAMP, v INT) " +
      "PARTITIONED BY (days(ts))")
    fill("tpw.db.ev")
    val t = s"$warehouse/db/ev"
    assert(ColeTemporal.readSpec(t, conf) == Some(ColeTemporal.Spec("days", "ts")))
    val dirs = new java.io.File(t).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("_t_")).sorted
    // 2024-03-01 = epoch day 19783; ten consecutive days
    assert(dirs.toSeq == (19783L until 19793L).map(d => s"_t_days_ts=$d"))
    // schema: the derived key is NOT a column
    assert(s.table("tpw.db.ev").schema.fieldNames.toSeq == Seq("id", "ts", "v"))
    // every row routed to ITS day
    val mis = s.table("tpw.db.ev")
      .withColumn("f", col("_cole_file"))
      .collect().count { r =>
        val day = r.getTimestamp(1).toInstant.getEpochSecond / 86400
        !r.getString(3).contains(s"_t_days_ts=$day/")
      }
    assert(mis == 0)
    assert(s.table("tpw.db.ev").count() == 200)
  }

  test("ts predicates prune whole day directories at planning; results stay exact") {
    val t = s"$warehouse/db/ev"
    val cole = spark.read.format("cole").load(t)
    def plannedFiles(filters: org.apache.spark.sql.sources.Filter*): Set[String] = {
      val b = new ColeScanBuilder(cole.schema, t, conf)
      b.pushFilters(filters.toArray)
      b.build().asInstanceOf[ColeScan].planInputPartitions()
        .map(_.asInstanceOf[ColeInputPartition].file).toSet
    }
    val all = plannedFiles()
    assert(all.nonEmpty)
    // range over 2 of 10 days: only those days' directories plan
    val lo = java.sql.Timestamp.from(Instant.parse("2024-03-04T00:00:00Z"))
    val hi = java.sql.Timestamp.from(Instant.parse("2024-03-06T00:00:00Z"))
    val pruned = plannedFiles(
      org.apache.spark.sql.sources.GreaterThanOrEqual("ts", lo),
      org.apache.spark.sql.sources.LessThan("ts", hi))
    assert(pruned.forall(f =>
      f.contains("_t_days_ts=19786/") || f.contains("_t_days_ts=19787/")),
      s"planned outside the range: $pruned")
    assert(pruned.size < all.size)
    // equality pins one day
    val eq = plannedFiles(org.apache.spark.sql.sources.EqualTo("ts",
      java.sql.Timestamp.from(Instant.parse("2024-03-09T05:30:00Z"))))
    assert(eq.forall(_.contains("_t_days_ts=19791/")), s"$eq")
    // results are row-exact at the boundary (the original predicate
    // still evaluates; the 00:30 base means day 19786 has rows < lo? no:
    // all of 03-04's rows are >= 00:00, so counts must match the full scan)
    val expect = spark.table("tpw.db.ev")
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi)).count()
    assert(expect == 40)
    assert(spark.read.format("cole").load(t)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi)).count() == expect)
  }

  test("aggregate pushdown prunes the same directories") {
    val t = s"$warehouse/db/ev"
    val lo = java.sql.Timestamp.from(Instant.parse("2024-03-04T00:00:00Z"))
    val agg = spark.read.format("cole").load(t)
      .filter(col("ts") >= lit(lo) &&
        col("ts") < lit(java.sql.Timestamp.from(Instant.parse("2024-03-05T00:00:00Z"))))
      .agg(count(lit(1)).as("n"), sum("id").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan)
    val r = agg.collect()(0)
    assert(r.getLong(0) == 20)
    // ids 60..79 live on day 4 (2024-03-04)
    assert(r.getLong(1) == (60L until 80L).sum)
  }

  test("parity: identical results to an unpartitioned twin; DML rewrites keep the layout") {
    val s = spark
    s.sql("CREATE TABLE tpw.db.twin (id BIGINT, ts TIMESTAMP, v INT)")
    fill("tpw.db.twin")
    val a = s.table("tpw.db.ev").select("id", "ts", "v").orderBy("id").collect().toSeq
    val b = s.table("tpw.db.twin").select("id", "ts", "v").orderBy("id").collect().toSeq
    assert(a == b)
    // copy-on-write UPDATE: rewritten rows re-derive their day directory
    s.sql("UPDATE tpw.db.ev SET v = -1 WHERE id = 65")
    val upd = s.table("tpw.db.ev").filter(col("id") === 65)
      .withColumn("f", col("_cole_file")).collect()(0)
    assert(upd.getInt(2) == -1)
    assert(upd.getString(3).contains("_t_days_ts=19786/"), upd.getString(3))
    assert(s.table("tpw.db.ev").count() == 200)
    // an UPDATE that MOVES the timestamp moves the row's directory
    s.sql("UPDATE tpw.db.ev SET ts = TIMESTAMP '2024-04-01 12:00:00Z' WHERE id = 66")
    val moved = s.table("tpw.db.ev").filter(col("id") === 66)
      .withColumn("f", col("_cole_file")).collect()(0)
    assert(moved.getString(3).contains(s"_t_days_ts=${19783 + 31}/"),
      moved.getString(3))
  }

  test("identity + temporal compose: region dirs nest day dirs") {
    val s = spark
    import s.implicits._
    s.sql("CREATE TABLE tpw.db.rg (id BIGINT, ts TIMESTAMP, region STRING) " +
      "PARTITIONED BY (region, days(ts))")
    val base = Instant.parse("2024-01-01T06:00:00Z")
    (0 until 40).map(i => (i.toLong,
        java.sql.Timestamp.from(base.plusSeconds(((i / 2) % 4) * 86400L)),
        if (i % 2 == 0) "eu" else "us"))
      .toDF("id", "ts", "region").writeTo("tpw.db.rg").append()
    val t = s"$warehouse/db/rg"
    val eu = new java.io.File(s"$t/region=eu").listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(eu.toSeq == (19723L until 19727L).map(d => s"_t_days_ts=$d"))
    assert(s.table("tpw.db.rg").schema.fieldNames.toSeq.sorted ==
      Seq("id", "region", "ts"))
    assert(s.table("tpw.db.rg").filter(col("region") === "eu").count() == 20)
  }

  test("path-based writes declare the layout once; appends keep it, conflicts reject") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pb"
    val base = Instant.parse("2024-06-01T00:00:00Z")
    def rows(n: Int) = (0 until n).map(i => (i.toLong,
      java.sql.Timestamp.from(base.plusSeconds(i * 43200L)))).toDF("id", "ts")
    rows(10).write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "days:ts").save(t)
    assert(ColeTemporal.readSpec(t, conf) == Some(ColeTemporal.Spec("days", "ts")))
    // plain append picks the sidecar up
    rows(4).write.format("cole").mode("append").save(t)
    assert(new java.io.File(s"$t/_t_days_ts=19875").isDirectory)
    assert(spark.read.format("cole").load(t).count() == 14)
    // conflicting re-declaration is loud
    val e = intercept[Exception] {
      rows(1).write.format("cole").mode("append")
        .option("partitionByTemporal", "hours:ts").save(t)
    }
    def chain(x: Throwable): String =
      if (x == null) "" else x.getMessage + " | " + chain(x.getCause)
    assert(chain(e).contains("laid out days:ts"), chain(e))
  }

  test("$partitions rolls the file inventory up to directory grain") {
    val rows = spark.sql(
      "SELECT partition, files, row_count, live_rows " +
        "FROM tpw.db.`ev$partitions` ORDER BY partition").collect()
    assert(rows.length == 11, rows.mkString(", ")) // 10 days + the moved row's
    assert(rows.map(_.getLong(2)).sum == 200)
    assert(rows.forall(r => r.getString(0).startsWith("_t_days_ts=") &&
      r.getInt(1) >= 1 && r.getLong(2) == r.getLong(3)))
    // agrees with $files
    val fromFiles = spark.sql(
      "SELECT partition, COUNT(*) c, SUM(row_count) rc " +
        "FROM tpw.db.`ev$files` GROUP BY partition ORDER BY partition").collect()
    assert(fromFiles.map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2))).toSeq ==
      rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq)
  }

  test("retention DELETE drops whole day directories without rewriting a byte") {
    val s = spark
    s.sql("CREATE TABLE tpw.db.ret (id BIGINT, ts TIMESTAMP, v INT) " +
      "PARTITIONED BY (days(ts))")
    fill("tpw.db.ret")
    val t = s"$warehouse/db/ret"
    def colFiles(): Map[String, (Long, Long)] = {
      def walk(d: java.io.File): Seq[java.io.File] =
        d.listFiles().toSeq.flatMap(f =>
          if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(t)).filter(_.getName.endsWith(".col"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = colFiles()
    // the retention shape: drop the first 3 of 10 days. Footer stats
    // prove every row of those days' files matches (their max ts <
    // cutoff), so classification is driver-side metadata and the files
    // DROP whole — nothing is rewritten, surviving files byte-identical
    s.sql("DELETE FROM tpw.db.ret WHERE ts < TIMESTAMP '2024-03-04 00:00:00'")
    assert(s.table("tpw.db.ret").count() == 140)
    val after = colFiles()
    val surviving = after.keySet
    assert(surviving.forall(f => !f.contains("_t_days_ts=19783/") &&
      !f.contains("_t_days_ts=19784/") && !f.contains("_t_days_ts=19785/")))
    // zero rewrites: every surviving file is the SAME file
    surviving.foreach(f => assert(after(f) == before(f), s"$f was rewritten"))
    assert(before.keySet -- surviving ==
      before.keySet.filter(f => f.contains("=19783/") ||
        f.contains("=19784/") || f.contains("=19785/")))
  }

  test("hours/months/years transforms resolve through SQL DDL and route correctly") {
    val s = spark
    import s.implicits._
    for ((fn, table, expectDirs) <- Seq(
        ("hours", "hr", Seq("_t_hours_ts=481728", "_t_hours_ts=481729")),
        ("months", "mo", Seq("_t_months_ts=24299", "_t_months_ts=24300")),
        ("years", "yr", Seq("_t_years_ts=2024", "_t_years_ts=2025")))) {
      s.sql(s"CREATE TABLE tpw.db.$table (id BIGINT, ts TIMESTAMP) " +
        s"PARTITIONED BY ($fn(ts))")
      // 2024-01-15T00:30Z and one unit later
      val base = Instant.parse("2024-12-15T00:30:00Z")
      val step = fn match {
        case "hours" => 3600L
        case "months" => 31L * 86400L
        case "years" => 366L * 86400L
      }
      Seq((1L, java.sql.Timestamp.from(base)),
          (2L, java.sql.Timestamp.from(base.plusSeconds(step))))
        .toDF("id", "ts").writeTo(s"tpw.db.$table").append()
      val dirs = new java.io.File(s"$warehouse/db/$table").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted.toSeq
      assert(dirs == expectDirs.sorted, s"$fn: $dirs")
      assert(s.table(s"tpw.db.$table").count() == 2)
    }
  }

  test("ordinal math: hours/months/years, negative epochs, boundaries") {
    import ColeTemporal.Spec
    val d = Spec("days", "ts"); val h = Spec("hours", "ts")
    val m = Spec("months", "ts"); val y = Spec("years", "ts")
    def micros(s: String) = Instant.parse(s).getEpochSecond * 1_000_000L
    assert(d.ordinal(micros("1970-01-01T00:00:00Z")) == 0L)
    assert(d.ordinal(micros("1969-12-31T23:59:59Z")) == -1L)
    assert(h.ordinal(micros("1970-01-01T01:00:00Z")) == 1L)
    assert(h.ordinal(micros("1969-12-31T23:00:00Z")) == -1L)
    assert(m.ordinal(micros("2024-03-15T12:00:00Z")) == 2024L * 12 + 2)
    assert(m.ordinal(micros("1969-12-31T00:00:00Z")) == 1969L * 12 + 11)
    assert(y.ordinal(micros("2024-12-31T23:59:59Z")) == 2024L)
    assert(y.ordinal(micros("1969-06-01T00:00:00Z")) == 1969L)
    // monotone across a month boundary
    assert(m.ordinal(micros("2024-02-29T23:59:59Z")) + 1 ==
      m.ordinal(micros("2024-03-01T00:00:00Z")))
    // derived keys are reserved/excluded everywhere
    assert(ColeTemporal.isDerivedKey(d.dirKey) && ColeTemporal.isLayoutKey("_bucket"))
    intercept[IllegalArgumentException](Spec("weeks", "ts"))
  }

  test("multi-task temporal write lands ONE file per unit directory (range distribution)") {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/onefile"
    val base = Instant.parse("2024-05-01T00:15:00Z")
    // 8 input partitions spraying rows over 12 hours: without the
    // r17-opt range distribution every task wrote its own file into
    // every hour directory it touched (tasks × dirs tiny files — the
    // measured 6000-file sf1 fan-out); with it, Spark range-partitions
    // on ts so each hour directory receives exactly one file
    (0 until 480).map { i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i * 90L)), i % 5)
    }.toDF("id", "ts", "v").repartition(8)
      .write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "hours:ts").save(dir)
    val perDir = ColeIO.listPartitioned(dir, conf)
      .groupBy(_._2.toMap.apply("_t_hours_ts")).view.mapValues(_.size).toMap
    // 480 rows × 90 s = 12 h starting 00:15 → spans 13 hour ordinals
    assert(perDir.size === 13, s"expected 13 hour directories: $perDir")
    assert(perDir.values.forall(_ == 1),
      s"each unit directory must hold ONE file per commit, got $perDir")
    // and the read is exact
    assert(s.read.format("cole").load(dir).count() === 480)
    assert(s.read.format("cole").load(dir)
      .filter(col("ts") >= to_timestamp(lit("2024-05-01 03:00:00")) &&
        col("ts") < to_timestamp(lit("2024-05-01 05:00:00"))).count() === 80)
  }

  test("multi-task BUCKETED write lands ONE file per bucket directory (clustered distribution)") {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/onefilebk"
    // 8 input partitions spraying keys over 4 buckets: the bucketed write
    // lane requests Distributions.clustered(bucketCols), so every
    // bucket's rows land in ONE task and each bucket directory receives
    // exactly one file per commit — the write-lane twin of the temporal
    // probe above (r18, VERDICT r17 ask #4: pin files-per-directory
    // bounds for every write lane)
    (0L until 4000L).map(i => (i, i * 3.0)).toDF("k", "v").repartition(8)
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:k").save(dir)
    val perDir = ColeIO.listPartitioned(dir, conf)
      .groupBy(_._2.toMap.apply("_bucket")).view.mapValues(_.size).toMap
    assert(perDir.size === 4, s"expected 4 bucket directories: $perDir")
    assert(perDir.values.forall(_ == 1),
      s"each bucket directory must hold ONE file per commit, got $perDir")
    assert(s.read.format("cole").load(dir).count() === 4000)
  }

  test("identity-hive write respects the CALLER's clustering (one file per directory when pre-clustered)") {
    val s = spark
    import s.implicits._
    val dir = s"$warehouse/db/onefileid"
    // The identity-only hive lane deliberately requests NO distribution:
    // the COW DML rewrite contract (one input file → at most one output
    // file, layout preserved byte-for-byte on untouched files) rides the
    // same write path and must not be reshuffled, and a forced
    // clustered(partCols) would serialize low-cardinality partition
    // writes (the classic hash-distribution skew hazard temporal avoids
    // only because its unit ordinal is monotone in ts). The CONTRACT is:
    // the caller's clustering is respected — a pre-repartitioned write
    // lands one file per directory; an unclustered multi-task write may
    // fan out, by design. This pins the bounded half.
    (0L until 3000L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
      .repartition(6, col("g")) // caller clusters by the partition column
      .write.format("cole").mode("overwrite")
      .partitionBy("g").save(dir)
    val perDir = ColeIO.listPartitioned(dir, conf)
      .groupBy(_._2.toMap.apply("g")).view.mapValues(_.size).toMap
    assert(perDir.size === 3, s"expected 3 partition directories: $perDir")
    assert(perDir.values.forall(_ == 1),
      s"a caller-clustered identity write must land ONE file per " +
        s"directory, got $perDir")
    assert(s.read.format("cole").load(dir).count() === 3000)
  }
}
