package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for snapshot versioning: a seeded random sequence of
  * committing operations (append, SQL DELETE, SQL UPDATE, truncating
  * overwrite, compaction, rollback) runs against a versioned catalog
  * table while a driver-side twin tracks the expected row-multiset AT
  * EVERY VERSION. At the end, every version time-travels back and must
  * match its twin exactly — including versions whose files have since
  * been rewritten away (retired-path resolution), and the log must agree
  * with the directory after every step.
  */
class ColeVersionsFuzzSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_verfuzz_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.vfz", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.vfz.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  type RowT = (Long, String, Long) // (id, grp, v)

  private def df(rows: Seq[RowT]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "grp", "v")
  }

  private def readBack(d: DataFrame): Seq[RowT] =
    d.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq.sorted

  test("random op sequences: every version time-travels to its twin") {
    val rnd = new scala.util.Random(4242)
    val tbl = "vfz.db.t"
    val dir = s"$warehouse/db/t"
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vfz.db")

    var nextId = 0L
    def batch(n: Int): Seq[RowT] = {
      val from = nextId; nextId += n
      (from until nextId).map(i => (i, s"g${rnd.nextInt(4)}", rnd.nextLong(1000)))
    }

    // seed the table, then enable versioning: v1 = baseline
    var expected: Vector[RowT] = batch(120).toVector
    df(expected).coalesce(2).write.format("cole").mode("overwrite").save(dir)
    ColeVersions.enable(dir, conf)
    val twins = scala.collection.mutable.Map(1L -> expected.sorted)

    def afterOp(): Unit = {
      val cur = ColeVersions.currentVersion(dir, conf)
      twins.get(cur) match {
        case Some(prev) => // op committed nothing: state must be unchanged
          assert(prev === expected.sorted,
            s"no version committed but expected state changed at v$cur")
        case None => twins(cur) = expected.sorted
      }
      val (missing, unexpected) = ColeVersions.audit(dir, conf)
      assert(missing.isEmpty && unexpected.isEmpty,
        s"log/disk drift after v$cur: missing=$missing unexpected=$unexpected")
      assert(readBack(spark.read.format("cole").load(dir)) === expected.sorted,
        s"live read diverged at v$cur")
    }

    (1 to 24).foreach { step =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // append
          val rows = batch(40 + rnd.nextInt(80))
          df(rows).coalesce(1 + rnd.nextInt(2))
            .write.format("cole").mode("append").save(dir)
          expected ++= rows
        case 4 | 5 => // SQL DELETE of a random id range
          val lo = rnd.nextLong(math.max(1L, nextId))
          val hi = lo + 30 + rnd.nextInt(120)
          spark.sql(s"DELETE FROM $tbl WHERE id >= $lo AND id < $hi")
          expected = expected.filterNot(r => r._1 >= lo && r._1 < hi)
        case 6 => // SQL UPDATE of one group slice
          val g = s"g${rnd.nextInt(4)}"
          val cut = rnd.nextLong(math.max(1L, nextId))
          spark.sql(s"UPDATE $tbl SET v = v + 10000 WHERE grp = '$g' AND id < $cut")
          expected = expected.map(r =>
            if (r._2 == g && r._1 < cut) (r._1, r._2, r._3 + 10000) else r)
        case 7 => // truncating overwrite with a fresh batch
          val rows = batch(60 + rnd.nextInt(60))
          df(rows).coalesce(1 + rnd.nextInt(2))
            .write.format("cole").mode("overwrite").save(dir)
          expected = rows.toVector
        case 8 => // compaction: row-preserving maintenance
          ColeCompact.compact(spark, dir, targetBytes = 1L << 30)
        case 9 => // rollback to a random known version
          val vs = twins.keys.toSeq.sorted
          val target = vs(rnd.nextInt(vs.length))
          ColeVersions.rollback(dir, conf, target)
          expected = twins(target).toVector
      }
      afterOp()
    }

    // the final exam: EVERY recorded version reads back as its twin
    twins.toSeq.sortBy(_._1).foreach { case (v, want) =>
      val got = readBack(spark.read.format("cole")
        .option("versionAsOf", v.toString).load(dir))
      assert(got === want, s"time travel to v$v diverged " +
        s"(got ${got.size} rows, want ${want.size})")
    }
    assert(twins.size > 10, s"fuzz degenerated: only ${twins.size} versions")
  }
}
