package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Group-based SQL UPDATE / MERGE INTO / expression-DELETE on COLE
  * tables (ColeRowLevelOperation): the copy-on-write DML rung above the
  * metadata DELETE fast path. The invariants that matter at 100 TB:
  * untouched files stay byte-identical, layouts (partitions, buckets,
  * sorted files, synthetic keys) survive the rewrite, and every row of a
  * replaced file that does NOT match the condition survives verbatim.
  */
class ColeRowLevelSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_rl_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.rlw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.rlw.warehouse", warehouse)
    s
  }

  private def fileBytes(dir: String): Map[String, Seq[Byte]] =
    ColeIO.listPartitioned(dir, ColeIO.driverConf()).map { case (st, _) =>
      val in = st.getPath.getFileSystem(ColeIO.driverConf()).open(st.getPath)
      val b = try in.readAllBytes() finally in.close()
      st.getPath.toString -> b.toSeq
    }.toMap

  test("UPDATE rewrites only files with matches; others stay byte-identical") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/upd"
    // several files with disjoint key ranges: stats classify exactly
    (0 until 4).foreach { part =>
      (part * 1000 until (part + 1) * 1000).map(i => (i.toLong, s"v$i", i * 10L))
        .toDF("k", "tag", "v").coalesce(1)
        .write.format("cole").mode(if (part == 0) "overwrite" else "append").save(t)
    }
    val before = fileBytes(t)
    assert(before.size >= 4)
    spark.sql("UPDATE rlw.db.upd SET v = v + 1, tag = 'hit' WHERE k >= 500 AND k < 1500")
    val after = fileBytes(t)
    // the two files whose ranges intersect [500, 1500) rewrote; the rest
    // are the SAME bytes at the SAME paths
    val untouched = before.keySet intersect after.keySet
    assert(untouched.size === 2, s"expected 2 untouched files, got $untouched")
    untouched.foreach(p => assert(before(p) === after(p), s"$p changed bytes"))
    // row-exact semantics
    val got = spark.table("rlw.db.upd")
    assert(got.count() === 4000)
    assert(got.filter(col("tag") === "hit").count() === 1000)
    assert(got.filter(col("k") === 700L).select("v").head.getLong(0) === 7001L)
    assert(got.filter(col("k") === 300L).select("v").head.getLong(0) === 3000L)
    // non-matching rows of REPLACED files survive verbatim
    assert(got.filter(col("k") === 400L).select("tag").head.getString(0) === "v400")
    // zero-match UPDATE: nothing rewrites at all
    val snap = fileBytes(t)
    spark.sql("UPDATE rlw.db.upd SET v = 0 WHERE k < 0")
    assert(fileBytes(t) === snap, "a zero-match UPDATE must not rewrite anything")
  }

  test("UPDATE on a bucketed table preserves layout, routing, and SPJ") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/bupd"
    (0 until 8000).map(i => (i.toLong, (i % 100).toLong)).toDF("k", "v")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(t)
    spark.sql("UPDATE rlw.db.bupd SET v = v + 1000 WHERE k < 2000")
    assert(ColeBucket.readSpec(t, ColeIO.driverConf()) === Some((4, Seq("k"))))
    for (b <- 0 until 4) {
      val ks = spark.read.format("cole").load(s"$t/_bucket=$b")
        .select("k").collect().map(_.getLong(0))
      assert(ks.nonEmpty)
      ks.foreach(k => assert(ColeBucket.bucketOf(k, 4) === b,
        s"updated table lost bucket routing for $k"))
      // replacement files stay SORTED on the bucket key
      ColeIO.listPartitioned(s"$t/_bucket=$b", ColeIO.driverConf()).foreach {
        case (st, _) =>
          val fk = spark.read.format("cole").load(st.getPath.toString)
            .select("k").collect().map(_.getLong(0))
          assert(fk.sameElements(fk.sorted),
            s"replacement file ${st.getPath.getName} lost its sort order")
      }
    }
    val got = spark.table("rlw.db.bupd")
    assert(got.count() === 8000)
    assert(got.filter(col("k") === 100L).select("v").head.getLong(0) === 1000L)
    assert(got.filter(col("k") === 5000L).select("v").head.getLong(0) === 0L)
    // the updated table still proves co-partitioning (zero-Exchange SPJ)
    (0 until 8000 by 2).map(i => (i.toLong, i % 5)).toDF("k", "w")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k")
      .save(s"$warehouse/db/bdim")
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("rlw.db.bupd").join(spark.table("rlw.db.bdim"), "k")
      j.collect()
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (if (p.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) 1
         else 0) + p.children.map(shuffles).sum + (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            shuffles(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            shuffles(q.plan)
          case _ => 0
        })
      assert(shuffles(j.queryExecution.executedPlan) === 0,
        s"updated bucketed table lost SPJ:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 4000)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("UPDATE of a composite source key re-derives the synthetic column and re-routes") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/skupd"
    (0 until 2000).map(i => (i.toLong / 4, i % 4, i.toLong))
      .toDF("k1", "k2", "v")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:k1,k2").option("bucketKey", "ck").save(t)
    // move key (100, 1) to (9999, 3): both the stored synth hash and the
    // row's bucket must follow
    spark.sql("UPDATE rlw.db.skupd SET k1 = 9999, k2 = 3 WHERE k1 = 100 AND k2 = 1")
    val moved = spark.table("rlw.db.skupd")
      .filter(col("k1") === 9999L).select("k1", "k2", "ck").collect()
    assert(moved.length === 1)
    val expCk = ColeBucket.combine(
      ColeBucket.keyHashLong(9999L), ColeBucket.keyHashLong(3L))
    assert(moved.head.getLong(2) === expCk,
      "synthetic key not recomputed from the UPDATED source keys")
    // and the row physically lives in the recomputed bucket
    val b = ColeBucket.bucketOf(expCk, 4)
    val inBucket = spark.read.format("cole").load(s"$t/_bucket=$b")
      .filter(col("k1") === 9999L).count()
    assert(inBucket === 1, s"moved row not found in its new bucket $b")
    // every OTHER row still routes consistently
    for (bb <- 0 until 4) {
      spark.read.format("cole").load(s"$t/_bucket=$bb")
        .select("k1", "k2", "ck").collect().foreach { r =>
          val ck = ColeBucket.combine(ColeBucket.keyHashLong(r.getLong(0)),
            ColeBucket.keyHashLong(r.getInt(1).toLong))
          assert(r.getLong(2) === ck && ColeBucket.bucketOf(ck, 4) === bb)
        }
    }
    assert(spark.table("rlw.db.skupd").count() === 2000)
  }

  test("UPDATE of a partition column moves rows across partition directories") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/pupd"
    (0 until 900).map(i => (i.toLong, s"r${i % 3}", i * 2L))
      .toDF("id", "region", "v")
      .write.format("cole").mode("overwrite").partitionBy("region").save(t)
    // move every r2 row with id < 100 into a NEW partition value
    spark.sql("UPDATE rlw.db.pupd SET region = 'moved' WHERE region = 'r2' AND id < 100")
    val got = spark.table("rlw.db.pupd")
    assert(got.count() === 900, "partition-move UPDATE lost rows")
    val moved = got.filter(col("region") === "moved")
    assert(moved.count() === (0 until 100).count(_ % 3 == 2).toLong)
    // physically relocated: the new directory exists and holds the rows
    val movedDir = spark.read.format("cole").load(s"$t/region=moved")
    assert(movedDir.count() === moved.count())
    // survivors of the rewritten partition kept their rows and values
    assert(got.filter(col("region") === "r2").count() ===
      (0 until 900).count(i => i % 3 == 2 && i >= 100).toLong)
    assert(got.filter(col("id") === 2L).select("region").head.getString(0) === "moved")
    assert(got.filter(col("id") === 2L).select("v").head.getLong(0) === 4L)
    // untouched partitions never rewrote
    assert(got.filter(col("region") === "r0").count() === 300)
  }

  test("MERGE INTO: matched update + not-matched insert, layout intact") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/mrg"
    (0 until 1000).map(i => (i.toLong, i * 2L)).toDF("k", "v")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(t)
    (500 until 1500).map(i => (i.toLong, -1L)).toDF("mk", "mv")
      .createOrReplaceTempView("mrg_src")
    spark.sql("""MERGE INTO rlw.db.mrg AS t USING mrg_src AS s
                 ON t.k = s.mk
                 WHEN MATCHED THEN UPDATE SET v = s.mv
                 WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.mk, s.mv)""")
    val got = spark.table("rlw.db.mrg")
    assert(got.count() === 1500)
    assert(got.filter(col("v") === -1L).count() === 1000)
    assert(got.filter(col("k") === 100L).select("v").head.getLong(0) === 200L)
    // inserts and rewrites both honored the bucket routing
    for (b <- 0 until 4) {
      spark.read.format("cole").load(s"$t/_bucket=$b")
        .select("k").collect().map(_.getLong(0))
        .foreach(k => assert(ColeBucket.bucketOf(k, 4) === b))
    }
    // NOT MATCHED BY SOURCE: rows the source doesn't cover delete — the
    // whole-table rewrite shape (every file is a candidate group)
    spark.sql("""MERGE INTO rlw.db.mrg AS t USING mrg_src AS s
                 ON t.k = s.mk
                 WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val after = spark.table("rlw.db.mrg")
    assert(after.count() === 1000, "only source-covered keys survive")
    assert(after.agg(min("k")).head.getLong(0) === 500L)
  }

  test("DELETE with a condition the metadata fast path cannot convert") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/edel"
    (0 until 1000).map(i => (i.toLong, s"t$i")).toDF("k", "tag")
      .write.format("cole").mode("overwrite").save(t)
    // k % 7 = 0 converts to no ColePredicate: canDeleteWhere is false and
    // the group-based path takes over
    spark.sql("DELETE FROM rlw.db.edel WHERE k % 7 = 0")
    val got = spark.table("rlw.db.edel")
    assert(got.count() === 1000 - (0 until 1000).count(_ % 7 == 0))
    assert(got.filter(col("k") % 7 === 0).count() === 0)
    assert(got.filter(col("k") === 8L).count() === 1)
  }

  test("runtime group filter restricts the rewrite to files with MATCHES, not just stat survivors") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/rgf"
    // 4 files with fully-OVERLAPPING id ranges (interleaved mod 4): page
    // stats cannot exclude any file for an id-equality condition — only
    // the runtime group filter (matching files from the _cole_file
    // subquery) can narrow the replacement set
    (0 until 4).foreach { f =>
      (0 until 1000).map(i => ((i * 4 + f).toLong, s"v${i * 4 + f}"))
        .toDF("id", "tag").coalesce(1)
        .write.format("cole").mode(if (f == 0) "overwrite" else "append").save(t)
    }
    val before = fileBytes(t)
    assert(before.size === 4)
    // id=17 ≡ 1 (mod 4): present in exactly one file, inside every file's
    // stat range
    spark.sql("UPDATE rlw.db.rgf SET tag = 'hit' WHERE id = 17")
    val after = fileBytes(t)
    val untouched = before.keySet intersect after.keySet
    assert(untouched.size === 3,
      s"runtime group filtering should leave 3 of 4 stat-overlapping files " +
        s"untouched, got ${untouched.size}")
    untouched.foreach(p => assert(before(p) === after(p), s"$p changed bytes"))
    val got = spark.table("rlw.db.rgf")
    assert(got.count() === 4000)
    assert(got.filter(col("tag") === "hit").collect().map(_.getLong(0)).toSeq === Seq(17L))
  }

  test("_cole_file metadata column is selectable on normal reads") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/metacol"
    (0 until 100).map(i => (i.toLong, i * 3L)).toDF("k", "v")
      .write.format("cole").mode("overwrite").save(t)
    val rows = spark.table("rlw.db.metacol")
      .select(col("k"), col("_cole_file")).collect()
    assert(rows.length === 100)
    val files = rows.map(_.getString(1)).distinct
    assert(files.nonEmpty && files.forall(_.endsWith(".col")), files.toSeq.toString)
  }
}
