package graft.sources.cole

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temporal partition spec EVOLUTION (r12): re-declaring the transform on
  * a grown table (days → hours) without rewriting a byte. Old-era files
  * stay under their `_t_days_ts=` directories and keep pruning by the
  * old spec; new writes route to `_t_hours_ts=`; a range query prunes
  * correctly across the boundary; time travel resolves the spec history
  * as of its version.
  */
class ColeTemporalEvolveSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_evolve_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.evw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.evw.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def rows(startDay: String, days: Int, perDay: Int, idBase: Long) = {
    val s = spark
    import s.implicits._
    val t0 = Timestamp.valueOf(s"$startDay 00:00:00").getTime
    (0 until days * perDay).map { j =>
      val d = j / perDay
      val i = j % perDay
      (idBase + j, new Timestamp(t0 + d * 86400000L + i * 3600000L),
        (j % 5).toDouble)
    }.toDF("id", "ts", "v")
  }

  test("evolve days->hours: zero rewrites, both eras prune, appends route by the new spec") {
    val t = s"$warehouse/db/ev1"
    // era 1: 10 days under days(ts)
    rows("2024-01-01", 10, 20, 0L)
      .write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "days:ts").save(t)
    val before = ColeIO.listPartitioned(t, conf)
      .map { case (st, _) => (st.getPath.toString, st.getLen,
        st.getModificationTime) }.toSet
    assert(ColeTemporal.readSpecs(t, conf) ===
      Seq(ColeTemporal.Spec("days", "ts")))
    // evolve; the active spec flips, history keeps both
    ColeTemporal.evolve(t, conf, ColeTemporal.Spec("hours", "ts"))
    assert(ColeTemporal.readSpecs(t, conf) ===
      Seq(ColeTemporal.Spec("days", "ts"), ColeTemporal.Spec("hours", "ts")))
    // era-1 files are byte-identical (zero rewrites)
    val after = ColeIO.listPartitioned(t, conf)
      .map { case (st, _) => (st.getPath.toString, st.getLen,
        st.getModificationTime) }.toSet
    assert(after === before, "evolution must not touch existing files")
    // era 2: 2 more days, plain append — routes by the NEW spec
    rows("2024-01-11", 2, 20, 100000L)
      .write.format("cole").mode("append").save(t)
    val files = ColeIO.listPartitioned(t, conf)
    val eraKeys = files.map(_._2.map(_._1)).distinct.toSet
    assert(eraKeys === Set(Seq("_t_days_ts"), Seq("_t_hours_ts")),
      s"mixed-era directory keys wrong: $eraKeys")
    // the append must not have clobbered the history sidecar
    assert(ColeTemporal.readSpecs(t, conf).length === 2)
    // total content correct
    val df = spark.read.format("cole").load(t)
    assert(df.count() === 10 * 20 + 2 * 20)
    // range query SPANNING the boundary: exact rows, era-correct pruning
    val spanning = df.filter(
      col("ts") >= to_timestamp(lit("2024-01-09 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-12 00:00:00")))
    assert(spanning.count() === 3 * 20)
    // prune assertion: only day dirs 9-10 (era 1) + hour dirs of day 11
    // (era 2) may open
    val d9 = java.time.LocalDate.parse("2024-01-09").toEpochDay
    val d11 = java.time.LocalDate.parse("2024-01-11").toEpochDay
    val eligible = files.count { case (_, parts) =>
      parts.toMap match {
        case pv if pv.contains("_t_days_ts") =>
          val d = pv("_t_days_ts").toLong; d >= d9 && d < d9 + 3
        case pv =>
          val h = pv("_t_hours_ts").toLong
          h >= d9 * 24 && h < (d9 + 3) * 24
      }
    }
    assert(eligible > 0 && eligible < files.size)
    ColeIO.opens.set(0)
    assert(spanning.agg(count(lit(1))).head().getLong(0) === 3 * 20)
    assert(ColeIO.opens.get() <= eligible,
      s"cross-era prune opened ${ColeIO.opens.get()}, eligible $eligible " +
        s"of ${files.size}")
    // a query entirely in era 2 prunes by hours
    val hoursOnly = df.filter(
      col("ts") >= to_timestamp(lit("2024-01-11 05:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-11 08:00:00")))
    assert(hoursOnly.count() === 3)
    // re-declaring the OLD spec on an append now conflicts with the
    // active one — loud
    val e = intercept[Exception] {
      rows("2024-01-13", 1, 5, 900000L)
        .write.format("cole").mode("append")
        .option("partitionByTemporal", "days:ts").save(t)
    }
    assert(e.getMessage.contains("laid out"))
    // no-op evolution is rejected
    val e2 = intercept[Exception] {
      ColeTemporal.evolve(t, conf, ColeTemporal.Spec("hours", "ts"))
    }
    assert(e2.getMessage.contains("already routes"))
  }

  test("versioned table: time travel resolves the spec history as of the version") {
    val t = s"$warehouse/db/ev2"
    rows("2024-02-01", 3, 10, 0L)
      .write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "days:ts").save(t)
    ColeVersions.enable(t, conf) // v1 = baseline (records days spec)
    rows("2024-02-04", 1, 10, 1000L)
      .write.format("cole").mode("append").save(t) // v2 (days era)
    spark.sql(s"CALL evw.system.evolve_temporal('db.ev2', 'hours:ts')") // v3
    rows("2024-02-05", 1, 10, 2000L)
      .write.format("cole").mode("append").save(t) // v4 (hours era)
    // as-of resolution: v2 sees only days; v4 sees the full history
    assert(ColeVersions.temporalSpecsAsOf(t, conf, 2L) ===
      Some(Seq(ColeTemporal.Spec("days", "ts"))))
    assert(ColeVersions.temporalSpecsAsOf(t, conf, 4L) ===
      Some(Seq(ColeTemporal.Spec("days", "ts"),
        ColeTemporal.Spec("hours", "ts"))))
    // a time-travel read at v2 plans only days-era files and still
    // prunes by the days transform
    val v2 = spark.read.format("cole").option("versionAsOf", "2").load(t)
    assert(v2.count() === 40)
    val oneDay = v2.filter(
      col("ts") >= to_timestamp(lit("2024-02-02 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-02-03 00:00:00")))
    assert(oneDay.count() === 10)
    // the live head reads all eras
    assert(spark.read.format("cole").load(t).count() === 50)
    // a cross-era DML rewrite adopts the ACTIVE spec (lazy migration):
    // update an era-1 row; its file rewrites into hours directories
    spark.sql(s"UPDATE evw.db.ev2 SET v = 99 WHERE id = 5")
    val moved = ColeIO.listPartitioned(t, conf).filter { case (_, parts) =>
      parts.toMap.contains("_t_hours_ts")
    }
    assert(moved.nonEmpty)
    val got = spark.read.format("cole").load(t)
      .filter(col("id") === 5).select("v").head().getDouble(0)
    assert(got === 99.0)
    assert(spark.read.format("cole").load(t).count() === 50)
  }

  test("compaction heals the hour-grain era: layout and history preserved, results identical") {
    val t = s"$warehouse/db/ev3"
    // sequential appends leave several part files per unit directory —
    // the small-file shape an hour-grain era accumulates commit by
    // commit (r17-opt: a single multi-task write no longer fragments —
    // temporal writes range-distribute on ts, one file per directory
    // per commit — so the fixture fragments the way real tables do:
    // repeated appends into the same unit directories)
    val era1 = rows("2024-03-01", 2, 20, 0L)
    era1.filter(col("id") % 2 === 0)
      .write.format("cole").mode("overwrite")
      .option("partitionByTemporal", "days:ts").save(t)
    era1.filter(col("id") % 2 =!= 0)
      .write.format("cole").mode("append").save(t)
    ColeTemporal.evolve(t, conf, ColeTemporal.Spec("hours", "ts"))
    val era2 = rows("2024-03-03", 1, 20, 5000L)
    era2.filter(col("id") % 2 === 0)
      .write.format("cole").mode("append").save(t)
    era2.filter(col("id") % 2 =!= 0)
      .write.format("cole").mode("append").save(t)
    val q = () => spark.read.format("cole").load(t)
      .filter(col("ts") >= to_timestamp(lit("2024-03-02 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-03-03 12:00:00")))
      .agg(count(lit(1)), sum("v"), min("id"), max("id"))
      .head().toSeq
    val before = q()
    val filesBefore = ColeIO.listPartitioned(t, conf).size
    val stats = ColeCompact.compact(spark, t, targetBytes = 1L << 30)
    assert(stats.filesAfter < filesBefore, s"no compaction happened: $stats")
    // layout intact: every file still under its era's unit directory,
    // history sidecar untouched
    val files = ColeIO.listPartitioned(t, conf)
    assert(files.map(_._2.map(_._1)).distinct.toSet ===
      Set(Seq("_t_days_ts"), Seq("_t_hours_ts")))
    assert(ColeTemporal.readSpecs(t, conf) ===
      Seq(ColeTemporal.Spec("days", "ts"), ColeTemporal.Spec("hours", "ts")))
    val spec = ColeTemporal.Spec("hours", "ts")
    files.filter(_._2.head._1 == "_t_hours_ts").foreach { case (st, parts) =>
      spark.read.format("cole").load(st.getPath.toString)
        .select("ts").collect().foreach { r =>
          assert(spec.ordinal(r.getTimestamp(0).getTime * 1000L).toString
            === parts.toMap.apply("_t_hours_ts"),
            "compaction moved a row out of its hour directory")
        }
    }
    assert(q() === before, "compaction changed query results")
    assert(spark.read.format("cole").load(t).count() === 60)
  }
}
