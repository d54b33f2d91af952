package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for VERSIONED deletion vectors: a seeded random
  * sequence of vector DELETEs (convertible and delta-path), MOR
  * UPDATE/MERGE, appends and compactions runs against a versioned
  * vector-mode table while an unversioned COPY-mode twin receives the
  * same statements. After every commit the twin's content is recorded;
  * at the end EVERY recorded version must time-travel to exactly its
  * recorded content (pinned vectors resolving per version), every
  * adjacent version pair must satisfy the change-feed reconstruction
  * contract `T(i-1) − deletes + inserts = T(i)`, and a rollback into
  * the middle of the history must restore that step's content while
  * the rolled-over versions stay readable.
  */
class ColeDvVersionsFuzzSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_dvvf_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.dvf", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.dvf.warehouse", warehouse)
    s
  }

  private def conf = ColeIO.driverConf()

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.select("id", "grp", "v").collect().map(_.toSeq.toVector).toSeq
      .sortBy(_.toString())

  test("random vector DML: every version time-travels to its twin; feed reconstructs") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 47)) {
      val rnd = new scala.util.Random(seed * 977)
      val n = 2000 + rnd.nextInt(2000)
      val base = (0 until n).map { i =>
        (i.toLong, (i % 5).toLong, rnd.nextInt(500).toLong)
      }.toDF("id", "grp", "v")
      val vName = s"f_${seed}_v" // versioned + vector
      val cName = s"f_${seed}_c" // unversioned copy-mode twin
      base.coalesce(3).write.format("cole").mode("overwrite")
        .save(s"$warehouse/db/$vName")
      base.coalesce(3).write.format("cole").mode("overwrite")
        .save(s"$warehouse/db/$cName")
      ColeVersions.enable(s"$warehouse/db/$vName", conf) // v1
      spark.sql(s"CALL dvf.system.delete_mode('db.$vName', 'vector')")

      // version -> twin content at that version
      val history = scala.collection.mutable.LinkedHashMap[Long, Seq[Seq[Any]]]()
      history(1L) = rowsOf(spark.table(s"dvf.db.$cName"))

      (1 to 6).foreach { step =>
        val lo = rnd.nextInt(n).toLong
        val hi = lo + 1 + rnd.nextInt(n / 3).toLong
        val kind = rnd.nextInt(5)
        def stmt(t: String): Unit = kind match {
          case 0 => // convertible DELETE → vector fast path
            spark.sql(s"DELETE FROM dvf.db.$t WHERE id >= $lo AND id < $hi")
          case 1 => // non-convertible DELETE → delta path on the vector table
            spark.sql(s"DELETE FROM dvf.db.$t " +
              s"WHERE id >= $lo AND id < $hi AND v % 7 = 3")
          case 2 => // MOR UPDATE
            spark.sql(s"UPDATE dvf.db.$t SET v = v + 1000 " +
              s"WHERE id >= $lo AND id < $hi AND v % 2 = 0")
          case 3 => // MOR MERGE
            val src = s"dvf_src_${t}_$step"
            Seq.range(lo, math.min(hi, lo + 150), 11L).map(k => (k, k + 9L))
              .toDF("k", "nv").createOrReplaceTempView(src)
            spark.sql(
              s"""MERGE INTO dvf.db.$t t0 USING $src s ON t0.id = s.k
                 |WHEN MATCHED AND t0.v < 900 THEN UPDATE SET v = s.nv
                 |WHEN NOT MATCHED THEN INSERT (id, grp, v)
                 |  VALUES (s.k + 1000000, 1, s.nv)""".stripMargin)
          case 4 => // append
            (0 until 50).map(i => (2000000L + step * 100 + i, 2L, i.toLong))
              .toDF("id", "grp", "v").coalesce(1)
              .write.format("cole").mode("append").save(s"$warehouse/db/$t")
        }
        stmt(vName)
        stmt(cName)
        // a statement that matched nothing commits no version — only
        // record history when the log actually advanced
        val ver = ColeVersions.currentVersion(s"$warehouse/db/$vName", conf)
        val twin = rowsOf(spark.table(s"dvf.db.$cName"))
        assert(rowsOf(spark.table(s"dvf.db.$vName")) === twin,
          s"live divergence (seed=$seed step=$step kind=$kind)")
        if (!history.contains(ver)) history(ver) = twin
        else assert(history(ver) === twin,
          s"no-op statement changed content (seed=$seed step=$step)")
        // mid-sequence compaction: row-preserving, materializes vectors
        if (step == 3) {
          ColeCompact.compact(s, s"$warehouse/db/$vName", 512L << 20)
          val ver2 = ColeVersions.currentVersion(s"$warehouse/db/$vName", conf)
          if (ver2 != ver) history(ver2) = twin
        }
      }

      // 1. every recorded version time-travels to its twin content
      history.foreach { case (ver, want) =>
        val got = rowsOf(s.read.format("cole")
          .option("versionAsOf", ver.toString).load(s"$warehouse/db/$vName"))
        assert(got === want,
          s"time travel v$ver diverged (seed=$seed): " +
            s"${got.size} rows vs ${want.size} expected")
      }

      // 2. change-feed reconstruction over each adjacent recorded pair
      val versions = history.keys.toSeq
      versions.sliding(2).foreach {
        case Seq(a, b) =>
          val feed = ColeChangeFeed.read(s, s"$warehouse/db/$vName", a, b)
          val dels = rowsOf(feed.filter(col("_change_type") === "delete"))
          val ins = rowsOf(feed.filter(col("_change_type") === "insert"))
          val reconstructed = (diffMultiset(history(a), dels) ++ ins)
            .sortBy(_.toString())
          assert(reconstructed === history(b),
            s"feed reconstruction ($a,$b] diverged (seed=$seed)")
        case _ => ()
      }

      // 3. rollback into the middle restores that content; history intact
      val mid = versions(versions.size / 2)
      ColeVersions.rollback(s"$warehouse/db/$vName", conf, mid)
      assert(rowsOf(spark.table(s"dvf.db.$vName")) === history(mid),
        s"rollback to v$mid diverged (seed=$seed)")
      history.foreach { case (ver, want) =>
        assert(rowsOf(s.read.format("cole")
          .option("versionAsOf", ver.toString)
          .load(s"$warehouse/db/$vName")) === want,
          s"post-rollback time travel v$ver diverged (seed=$seed)")
      }
    }
  }

  /** Multiset difference a − b (both sorted row dumps). */
  private def diffMultiset(a: Seq[Seq[Any]], b: Seq[Seq[Any]]): Seq[Seq[Any]] = {
    val counts = scala.collection.mutable.HashMap.empty[Seq[Any], Int]
    b.foreach(r => counts(r) = counts.getOrElse(r, 0) + 1)
    a.filter { r =>
      counts.get(r) match {
        case Some(c) if c > 0 => counts(r) = c - 1; false
        case _ => true
      }
    }
  }
}
