package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for row-level DML: seeded random tables in every
  * layout (flat, hive-partitioned, hash-bucketed, synthetic-key) take a
  * SEQUENCE of random UPDATE/DELETE statements; after each mutation the
  * table must equal the same mutation applied to an in-memory DataFrame
  * twin (which never touches the COLE write/rewrite path). Catches the
  * whole family of replace-path corruption: lost non-matching rows of
  * rewritten groups, stale synthetic keys, duplicated survivors,
  * mis-routed partition moves.
  */
class ColeRowLevelFuzzSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_rlfuzz_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.fwh", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.fwh.warehouse", warehouse)
    s
  }

  test("random UPDATE/DELETE sequences match the DataFrame twin in every layout") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 42); layout <- Seq("flat", "part", "bucket", "synth")) {
      val rnd = new scala.util.Random(seed * 31 + layout.hashCode)
      val n = 4000 + rnd.nextInt(4000)
      val rows = (0 until n).map { i =>
        (i.toLong, (i % (3 + rnd.nextInt(4))).toLong, rnd.nextInt(1000).toLong,
          s"g${i % 5}")
      }
      var twin: DataFrame = rows.toDF("id", "grp", "v", "tag").cache()
      twin.count()
      val tname = s"fwh.db.f_${layout}_$seed"
      val dir = s"$warehouse/db/f_${layout}_$seed"
      val w = twin.write.format("cole").mode("overwrite")
      (layout match {
        case "flat" => w
        case "part" => w.partitionBy("tag")
        case "bucket" => w.option("bucketBy", "4:id")
        case "synth" => w.option("bucketBy", "4:id,grp").option("bucketKey", "ck")
      }).save(dir)

      def tableNow: DataFrame =
        spark.table(tname).select("id", "grp", "v", "tag")

      (1 to 4).foreach { step =>
        val lo = rnd.nextInt(n).toLong
        val hi = lo + 1 + rnd.nextInt(n / 2).toLong
        val m = rnd.nextInt(3)
        if (rnd.nextBoolean()) {
          val bump = 1 + rnd.nextInt(100)
          val cond = col("id") >= lo && col("id") < hi && col("v") % 3 === m
          spark.sql(s"UPDATE $tname SET v = v + $bump, tag = concat(tag, '+') " +
            s"WHERE id >= $lo AND id < $hi AND v % 3 = $m")
          twin = twin.select(col("id"), col("grp"),
            when(cond, col("v") + bump).otherwise(col("v")).as("v"),
            when(cond, concat(col("tag"), lit("+"))).otherwise(col("tag")).as("tag"))
            .cache()
          twin.count()
        } else {
          spark.sql(s"DELETE FROM $tname WHERE id >= $lo AND id < $hi " +
            s"AND v % 5 = $m")
          twin = twin.filter(
            !(col("id") >= lo && col("id") < hi && col("v") % 5 === m)).cache()
          twin.count()
        }
        val got = tableNow.collect().map(_.toSeq).toSet
        val want = twin.collect().map(_.toSeq).toSet
        assert(got === want,
          s"DML divergence (seed=$seed layout=$layout step=$step): " +
            s"${(got diff want).take(3)} extra, ${(want diff got).take(3)} missing")
        // no-op replay (r9 fingerprint discard): an identity UPDATE whose
        // condition MATCHES rows but changes nothing must leave every
        // file byte-identical in EVERY layout — per-file discard on
        // shuffle-free plans, whole-operation total under the bucketed
        // clustered-write exchange
        def stampsNow: Set[(String, Long, Long)] =
          ColeIO.listPartitioned(dir, ColeIO.driverConf()).map { case (st, _) =>
            (st.getPath.toString, st.getLen, st.getModificationTime)
          }.toSet
        val stamps = stampsNow
        spark.sql(s"UPDATE $tname SET v = v WHERE id >= $lo AND id < $hi")
        assert(stampsNow === stamps,
          s"identity UPDATE rewrote files (seed=$seed layout=$layout step=$step)")
      }
      // layout invariants survive the whole sequence
      layout match {
        case "bucket" =>
          for (b <- 0 until 4)
            spark.read.format("cole").load(s"$dir/_bucket=$b")
              .select("id").collect().map(_.getLong(0))
              .foreach(k => assert(ColeBucket.bucketOf(k, 4) === b))
        case "synth" =>
          for (b <- 0 until 4)
            spark.read.format("cole").load(s"$dir/_bucket=$b")
              .select("id", "grp", "ck").collect().foreach { r =>
                val ck = ColeBucket.combine(ColeBucket.keyHashLong(r.getLong(0)),
                  ColeBucket.keyHashLong(r.getLong(1)))
                assert(r.getLong(2) === ck && ColeBucket.bucketOf(ck, 4) === b,
                  s"stale synthetic key after DML (seed=$seed)")
              }
        case _ => ()
      }
    }
  }
}
