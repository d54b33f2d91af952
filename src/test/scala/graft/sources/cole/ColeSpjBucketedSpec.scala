package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hash-bucketed storage-partitioned joins — the fact-fact case.
  *
  * Identity-partitioned SPJ (ColeSpjSpec) needs one directory per key
  * value, which only suits nation-grade cardinality. Bucketed layout
  * routes rows to `_bucket=<b>/` by a shared hash (ColeBucket), the scan
  * reports `bucket(n, col)` KeyGroupedPartitioning, and the `cole`
  * catalog's FunctionCatalog lets Spark prove both sides co-partitioned —
  * a high-cardinality orders ⋈ lineitem joins with ZERO Exchange.
  */
class ColeSpjBucketedSpec extends AnyFunSuite {

  private lazy val warehouse =
    Files.createTempDirectory("cole_bucket_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .getOrCreate()
    // set at runtime: the suite may inherit another suite's session, and
    // catalogs resolve lazily from conf at first reference
    s.conf.set("spark.sql.catalog.bwh", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.bwh.warehouse", warehouse)
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

  /** 20k-key fact table + 5-rows-per-key detail table, both bucketed 8
    * ways on the join key. Keys are high-cardinality: identity
    * partitioning would need 20k directories.
    */
  private lazy val written: Unit = {
    val s = spark
    import s.implicits._
    (0 until 20000).map(i => (i.toLong, s"o$i", (i % 97).toDouble))
      .toDF("okey", "otag", "oval")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "8:okey").save(s"$warehouse/ord")
    (0 until 100000).map(i => (i.toLong / 5, i.toLong, (i % 13).toDouble))
      .toDF("lkey", "lid", "lval")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "8:lkey").save(s"$warehouse/li")
  }

  test("bucketed layout self-describes and round-trips") {
    written
    val spec = ColeBucket.readSpec(s"$warehouse/ord", ColeIO.driverConf())
    assert(spec === Some((8, Seq("okey"))))
    // every row landed in the bucket the shared hash assigns its key
    val files = ColeIO.listPartitioned(s"$warehouse/ord", ColeIO.driverConf())
    assert(files.nonEmpty && files.forall(_._2.map(_._1) == Seq("_bucket")))
    val byDir = spark.read.format("cole").load(s"$warehouse/ord")
    assert(byDir.count() === 20000)
    assert(byDir.schema.fieldNames.toSeq === Seq("okey", "otag", "oval"),
      "_bucket is layout, not schema")
    val got = spark.table("bwh.ord").select("okey", "otag", "oval")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === (0 until 20000).map(i =>
      (i.toLong, s"o$i", (i % 97).toDouble)).toSet)
  }

  test("writer and catalog bucket function place equal keys equally") {
    written
    // read each bucket directory directly; its rows' keys must hash there
    for (b <- 0 until 8) {
      val rows = spark.read.format("cole").load(s"$warehouse/ord/_bucket=$b")
        .select("okey").collect().map(_.getLong(0))
      assert(rows.nonEmpty, s"bucket $b empty — degenerate hash")
      rows.foreach(k => assert(ColeBucket.bucketOf(k, 8) === b))
    }
  }

  test("same-bucketed fact-fact join + per-key aggregate: zero Exchange") {
    written
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val o = spark.table("bwh.ord")
      val li = spark.table("bwh.li")
      val joined = o.join(li, o("okey") === li("lkey"))
        .groupBy(o("okey").as("k"))
        .agg(count(lit(1)).as("n"), sum("lval").as("w"), max("oval").as("mx"))
      assert(countShuffles(joined) === 0,
        s"bucketed SPJ must leave no exchange:\n${joined.queryExecution.executedPlan}")
      val got = joined.collect()
      assert(got.length === 20000)
      val m = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m.values.forall(_ == 5L), "every key has exactly 5 detail rows")
    }
  }

  private def countSorts(df: DataFrame): Int = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (if (p.isInstanceOf[org.apache.spark.sql.execution.SortExec]) 1 else 0) +
        p.children.map(walk).sum +
        (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(q.plan)
          case _ => 0
        })
    walk(df.queryExecution.executedPlan)
  }

  test("sorted bucket files report their order: SMJ with zero Sort") {
    written
    // compaction guarantees the single-file-per-bucket steady state the
    // ordering claim requires (a multi-task clustered write may leave one
    // file per TASK per bucket — whether the tiny fixture write coalesced
    // to one task depends on AQE, which another suite may have toggled)
    ColeCompact.compact(spark, s"$warehouse/ord", targetBytes = 1L << 30)
    ColeCompact.compact(spark, s"$warehouse/li", targetBytes = 1L << 30)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val o = spark.table("bwh.ord")
      val li = spark.table("bwh.li")
      def join = o.join(li, o("okey") === li("lkey"))
        .select(o("okey"), li("lid"), li("lval"))
      // one file per bucket: the scan reports its sort order and the
      // SMJ's Sorts vanish along with the Exchanges
      assert(countSorts(join) === 0,
        s"sorted bucket scan must satisfy SMJ ordering:\n${join.queryExecution.executedPlan}")
      assert(countShuffles(join) === 0)
      val before = join.collect().map(_.toSeq).toSet

      // an append puts a SECOND file in each bucket: concatenated reads
      // are no longer sorted, the claim withdraws, the Sort comes back —
      // and the results stay exact
      val s = spark
      import s.implicits._
      Seq((20000L, 500000L, 1.0), (20001L, 500001L, 2.0))
        .toDF("lkey", "lid", "lval")
        .write.format("cole").mode("append").save(s"$warehouse/li")
      val li2 = spark.table("bwh.li")
      def join2 = o.join(li2, o("okey") === li2("lkey"))
        .select(o("okey"), li2("lid"), li2("lval"))
      assert(countSorts(join2) > 0,
        "multi-file buckets must withdraw the ordering claim")
      assert(join2.collect().map(_.toSeq).toSet === before,
        "appended keys have no orders match; join content unchanged")
      // restore the single-file-per-bucket steady state via compaction
      ColeCompact.compact(spark, s"$warehouse/li", targetBytes = 1L << 30)
      assert(countSorts(join2) === 0,
        "compaction restores one file per bucket and the claim returns")
    }
  }

  test("bucketed join result matches the shuffled plan exactly") {
    written
    val o = spark.table("bwh.ord")
    val li = spark.table("bwh.li")
    def q = o.join(li, o("okey") === li("lkey")).select("okey", "lid", "oval", "lval")
    val spj = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      q.collect().map(_.toSeq).toSet
    }
    val shuffled = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "false") {
      q.collect().map(_.toSeq).toSet
    }
    assert(spj === shuffled)
    assert(spj.size === 100000)
  }

  test("one-sided join: only the UNBUCKETED side shuffles, into the stored bucketing") {
    written
    val s = spark
    import s.implicits._
    // an arbitrary in-memory frame — not bucketed, not even a table
    val other = (0 until 20000 by 3).map(i => (i.toLong, s"m$i")).toDF("okey2", "mtag")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true") {
      val o = spark.table("bwh.ord")
      val j = o.join(other, o("okey") === other("okey2"))
        .select("okey", "otag", "mtag")
      val shuffles = countShuffles(j)
      assert(shuffles === 1,
        s"one-sided bucketed join must shuffle exactly the unbucketed side " +
          s"(got $shuffles):\n${j.queryExecution.executedPlan}")
      assert(j.count() === (0 until 20000 by 3).size)
    }
  }

  test("composite bucket keys: routing, exact joins, and composite point-lookup pruning") {
    val s = spark
    import s.implicits._
    // composite natural key (orderkey, linenumber)-style
    (0 until 6000).map(i => (i.toLong / 4, i % 4, s"d$i"))
      .toDF("ok", "ln", "dtag")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:ok,ln").save(s"$warehouse/m1")
    (0 until 6000 by 2).map(i => (i.toLong / 4, i % 4, (i % 9).toDouble))
      .toDF("ok", "ln", "w")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:ok,ln").save(s"$warehouse/m2")
    assert(ColeBucket.readSpec(s"$warehouse/m1", ColeIO.driverConf())
      === Some((4, Seq("ok", "ln"))))
    // routing: every row's combined hash lands in its directory
    def combined(ok: Long, ln: Int): Int = ColeBucket.bucketOfHash(
      ColeBucket.combine(ColeBucket.keyHashLong(ok), ColeBucket.keyHashLong(ln.toLong)), 4)
    for (b <- 0 until 4) {
      val rows = spark.read.format("cole").load(s"$warehouse/m1/_bucket=$b")
        .select("ok", "ln").collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(rows.nonEmpty)
      rows.foreach { case (ok, ln) => assert(combined(ok, ln) === b) }
    }
    // join on BOTH keys through the catalog stays exact. (Spark's SPJ
    // machinery resolves only SINGLE-reference bucket transforms today —
    // V2ExpressionUtils routes multi-ref buckets through the generic
    // named-transform path whose literal child defeats the co-partition
    // check — so the PLAIN composite layout buys routing + pruning only.
    // The zero-Exchange composite join is the `bucketKey` synthetic-
    // column layout, proven in the "synthetic combined key" test below.)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.table("bwh.m1")
      val b = spark.table("bwh.m2")
      val j = a.join(b, Seq("ok", "ln"))
      assert(j.count() === 3000)
    }
    // a point lookup pinning BOTH columns prunes to one bucket
    val (pk, pl) = (250L, 2)
    ColeIO.opens.set(0)
    val got = spark.read.format("cole").load(s"$warehouse/m1")
      .filter(col("ok") === pk && col("ln") === pl).select("dtag").collect()
    assert(got.length === 1)
    val fsFiles = ColeIO.listPartitioned(s"$warehouse/m1", ColeIO.driverConf())
    val inBucket = fsFiles.count(_._2.head._2 == combined(pk, pl).toString)
    assert(ColeIO.opens.get() <= inBucket,
      s"composite point lookup opened ${ColeIO.opens.get()} files, bucket holds $inBucket")
    // pinning only ONE column must NOT prune incorrectly (and stays exact)
    assert(spark.read.format("cole").load(s"$warehouse/m1")
      .filter(col("ok") === pk).count() === 4)
  }

  test("synthetic combined key: composite-key join runs with ZERO Exchange") {
    val s = spark
    import s.implicits._
    // THE PATTERN for composite-key SPJ: Spark resolves only
    // single-reference bucket transforms, so bucketKey tells the writer
    // to STORE the combined avalanche hash as a real LONG column and
    // bucket on it. Both scans then report bucket(n, ck) — resolvable —
    // and Spark's SPJ proof needs the equi-join keys to be EXACTLY
    // {ck}; the natural keys ride as range-pair residuals
    // (ColeBucket.synthKeyJoinCond), keeping the join row-exact against
    // the 2^-64 hash collision without defeating the co-partition check.
    (0 until 6000).map(i => (i.toLong / 4, i % 4, s"d$i"))
      .toDF("ok", "ln", "dtag")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:ok,ln").option("bucketKey", "ck")
      .save(s"$warehouse/sk1")
    (0 until 6000 by 2).map(i => (i.toLong / 4, i % 4, (i % 9).toDouble))
      .toDF("ok", "ln", "w")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:ok,ln").option("bucketKey", "ck")
      .save(s"$warehouse/sk2")
    // layout self-describes: single-column spec on ck + the derivation
    assert(ColeBucket.readSpec(s"$warehouse/sk1", ColeIO.driverConf())
      === Some((4, Seq("ck"))))
    assert(ColeBucket.readDerivation(s"$warehouse/sk1", ColeIO.driverConf())
      === Some(("ck", Seq("ok", "ln"))))
    // the stored synth value IS the combined hash; routing applies one
    // more avalanche (byte-for-byte a single-column layout on ck)
    for (b <- 0 until 4) {
      val rows = spark.read.format("cole").load(s"$warehouse/sk1/_bucket=$b")
        .select("ok", "ln", "ck").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(rows.nonEmpty)
      rows.foreach { case (ok, ln, ck) =>
        assert(ck === ColeBucket.combine(
          ColeBucket.keyHashLong(ok), ColeBucket.keyHashLong(ln.toLong)))
        assert(ColeBucket.bucketOf(ck, 4) === b)
      }
    }
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.table("bwh.sk1")
      val b = spark.table("bwh.sk2")
      def spj = a.join(b, ColeBucket.synthKeyJoinCond(a, b, "ck", Seq("ok", "ln")))
      assert(countShuffles(spj) === 0,
        "composite-key SPJ through the synthetic column must leave no " +
          s"exchange:\n${spj.queryExecution.executedPlan}")
      // result identical to the natural (ok, ln) join
      val viaSynth = spj
        .select(a("ok"), a("ln"), col("dtag"), col("w"))
        .collect().map(_.toSeq).toSet
      val natural = a.join(b, Seq("ok", "ln"))
        .select(a("ok"), a("ln"), col("dtag"), col("w"))
        .collect().map(_.toSeq).toSet
      assert(viaSynth === natural)
      assert(viaSynth.size === 3000)
    }
    // composite point lookup prunes through the DERIVATION (no synth
    // column referenced in the filter)
    val (pk, pl) = (250L, 2)
    val ckOf = ColeBucket.combine(
      ColeBucket.keyHashLong(pk), ColeBucket.keyHashLong(pl.toLong))
    val bOf = ColeBucket.bucketOf(ckOf, 4)
    ColeIO.opens.set(0)
    val got = spark.read.format("cole").load(s"$warehouse/sk1")
      .filter(col("ok") === pk && col("ln") === pl).select("dtag").collect()
    assert(got.length === 1)
    val fsFiles = ColeIO.listPartitioned(s"$warehouse/sk1", ColeIO.driverConf())
    val inBucket = fsFiles.count(_._2.head._2 == bOf.toString)
    assert(ColeIO.opens.get() <= inBucket,
      s"derived point lookup opened ${ColeIO.opens.get()} files, bucket holds $inBucket")
  }

  test("synthetic combined key: appends re-derive; layout drift rejected loudly") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/ska"
    (0 until 400).map(i => (i.toLong, i % 3, "a")).toDF("k1", "k2", "src")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:k1,k2").option("bucketKey", "ck").save(t)
    // plain append (no options): sidecar derivation governs routing
    (400 until 800).map(i => (i.toLong, i % 3, "b")).toDF("k1", "k2", "src")
      .write.format("cole").mode("append").save(t)
    for (b <- 0 until 4) {
      val rows = spark.read.format("cole").load(s"$t/_bucket=$b")
        .select("k1", "k2", "ck").collect()
      rows.foreach { r =>
        val ck = ColeBucket.combine(ColeBucket.keyHashLong(r.getLong(0)),
          ColeBucket.keyHashLong(r.getInt(1).toLong))
        assert(r.getLong(2) === ck && ColeBucket.bucketOf(ck, 4) === b,
          s"appended row routed inconsistently in bucket $b")
      }
    }
    assert(spark.read.format("cole").load(t).count() === 800)
    // re-declaring a DIFFERENT derivation on append fails loudly
    val e = intercept[Exception] {
      (0 until 10).map(i => (i.toLong, i % 3, "c")).toDF("k1", "k2", "src")
        .write.format("cole").mode("append")
        .option("bucketBy", "4:k2,k1").option("bucketKey", "ck").save(t)
    }
    assert(e.getMessage.contains("derivation") || e.getMessage.contains("layout"),
      s"expected loud derivation-drift rejection, got: ${e.getMessage}")
    // a colliding synth name fails loudly
    val e2 = intercept[Exception] {
      (0 until 10).map(i => (i.toLong, i % 3, "c")).toDF("k1", "k2", "src")
        .write.format("cole").mode("overwrite")
        .option("bucketBy", "4:k1,k2").option("bucketKey", "src")
        .save(s"$warehouse/skbad")
    }
    assert(e2.getMessage.contains("bucketKey"),
      s"expected loud synth-name rejection, got: ${e2.getMessage}")
  }

  test("string bucket keys route consistently") {
    val s = spark
    import s.implicits._
    (0 until 3000).map(i => (s"user_$i", i.toLong))
      .toDF("uid", "n")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:uid").save(s"$warehouse/su")
    (0 until 3000).map(i => (s"user_$i", (i % 11).toDouble))
      .toDF("uid", "v")
      .write.format("cole").mode("overwrite")
      .option("bucketBy", "4:uid").save(s"$warehouse/sv")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("bwh.su").join(spark.table("bwh.sv"), "uid")
      assert(countShuffles(j) === 0,
        s"string-keyed bucketed SPJ must leave no exchange:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 3000)
    }
  }

  test("appends into a bucketed table keep routing by the sidecar spec") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/app"
    (0 until 500).map(i => (i.toLong, "a")).toDF("k", "src")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(t)
    // no bucketBy option on the append — the sidecar governs
    (500 until 1000).map(i => (i.toLong, "b")).toDF("k", "src")
      .write.format("cole").mode("append").save(t)
    for (b <- 0 until 4) {
      val ks = spark.read.format("cole").load(s"$t/_bucket=$b")
        .select("k").collect().map(_.getLong(0))
      ks.foreach(k => assert(ColeBucket.bucketOf(k, 4) === b,
        s"appended row $k landed in wrong bucket $b"))
    }
    assert(spark.read.format("cole").load(t).count() === 1000)
  }

  test("point lookups prune to the matching bucket directories") {
    written
    val t = spark.read.format("cole").load(s"$warehouse/ord")
    val fsFiles = ColeIO.listPartitioned(s"$warehouse/ord", ColeIO.driverConf())
    val perBucket = fsFiles.groupBy(_._2.head._2).view.mapValues(_.size).toMap
    val totalFiles = fsFiles.size
    // equality on the bucket column: only that bucket's files open
    val key = 12345L
    val b = ColeBucket.bucketOf(key, 8)
    ColeIO.opens.set(0)
    val got = t.filter(col("okey") === key).select("otag").collect()
    assert(got.map(_.getString(0)).toSeq === Seq(s"o$key"))
    val opened = ColeIO.opens.get()
    assert(opened <= perBucket(b.toString),
      s"point lookup opened $opened files; bucket $b only has ${perBucket(b.toString)} " +
        s"of $totalFiles")
    // IN on the bucket column: union of the pinned buckets only
    val keys = Seq(7L, 999L, 18123L)
    val inBuckets = keys.map(ColeBucket.bucketOf(_, 8)).toSet
    ColeIO.opens.set(0)
    assert(t.filter(col("okey").isin(keys: _*)).count() === keys.size)
    val openedIn = ColeIO.opens.get()
    val allowed = inBuckets.toSeq.map(b0 => perBucket(b0.toString)).sum
    assert(openedIn <= allowed,
      s"IN lookup opened $openedIn files; pinned buckets $inBuckets hold $allowed")
    // an aggregate with the same claimed filter prunes too
    ColeIO.opens.set(0)
    val s1 = t.filter(col("okey") === key).agg(sum("oval")).head().getDouble(0)
    assert(s1 === (key % 97).toDouble)
    assert(ColeIO.opens.get() <= perBucket(b.toString),
      "filtered aggregate must prune buckets at planning")
    // a range predicate must NOT prune (hash buckets don't order)
    assert(t.filter(col("okey") < 100L).count() === 100)
  }

  test("ColeCompact preserves the bucketed layout and its zero-Exchange join") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/cmp"
    // many small files: 4 append batches x 4 tasks land ~16 files/bucket
    (0 until 4).foreach { b =>
      (0 until 4000).map(i => ((b * 4000 + i).toLong, s"c$i"))
        .toDF("k", "tag").repartition(4)
        .write.format("cole")
        .mode(if (b == 0) "overwrite" else "append")
        .option("bucketBy", "4:k").save(t)
    }
    val before = ColeIO.listPartitioned(t, ColeIO.driverConf()).size
    val stats = ColeCompact.compact(spark, t, targetBytes = 64L << 20)
    assert(stats.filesAfter < before, s"no compaction happened: $stats")
    // spec survives, routing survives, per-bucket dirs intact
    assert(ColeBucket.readSpec(t, ColeIO.driverConf()) === Some((4, Seq("k"))))
    for (b <- 0 until 4) {
      val ks = spark.read.format("cole").load(s"$t/_bucket=$b")
        .select("k").collect().map(_.getLong(0))
      assert(ks.nonEmpty)
      ks.foreach(k => assert(ColeBucket.bucketOf(k, 4) === b,
        s"compaction moved row $k out of bucket $b"))
    }
    assert(spark.read.format("cole").load(t).count() === 16000)
    // compaction preserves the SORTED layout: each compacted file is one
    // ordered run, not a concatenation of the input runs
    ColeIO.listPartitioned(t, ColeIO.driverConf()).foreach { case (st, _) =>
      val ks = spark.read.format("cole").load(st.getPath.toString)
        .select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted),
        s"compacted bucket file ${st.getPath.getName} lost its sort order")
    }
    // the compacted table still proves co-partitioning through the catalog
    (0 until 16000 by 2).map(i => (i.toLong, i % 5)).toDF("k", "w")
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k")
      .save(s"$warehouse/cmp2")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table("bwh.cmp").join(spark.table("bwh.cmp2"), "k")
      assert(countShuffles(j) === 0,
        s"compacted bucketed SPJ reintroduced a shuffle:\n${j.queryExecution.executedPlan}")
      assert(j.count() === 8000)
    }
  }

  test("bucketed writes cluster + sort by key: files arrive DELTA-encodable and range-prunable") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/sorted"
    // adversarially shuffled input: the write's RequiresDistributionAndOrdering
    // must deliver sorted runs regardless
    val rnd = new scala.util.Random(5)
    rnd.shuffle((0 until 20000).toVector).map(i => (i.toLong, s"v$i"))
      .toDF("k", "v").repartition(8)
      .write.format("cole").mode("overwrite").option("bucketBy", "4:k").save(t)
    // every individual bucket FILE is sorted on the key
    val files = ColeIO.listPartitioned(t, ColeIO.driverConf())
    assert(files.nonEmpty)
    files.foreach { case (st, _) =>
      val ks = spark.read.format("cole").load(st.getPath.toString)
        .select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted),
        s"bucket file ${st.getPath.getName} not sorted on the bucket key")
    }
    assert(spark.read.format("cole").load(t).count() === 20000)
    // sorted layout: a narrow range predicate prunes most row groups —
    // compare rows the scan DECODES via the claimed-filter selection
    // (file opens are bucket-pruned separately; this checks page stats)
    val hit = spark.read.format("cole").load(t)
      .filter(col("k") >= 10000L && col("k") < 10050L)
    assert(hit.count() === 50)
  }

  test("hive-partitioned and bucketed layouts are mutually exclusive") {
    val s = spark
    import s.implicits._
    val e = intercept[Exception] {
      (0 until 10).map(i => (i, i % 2, s"x$i")).toDF("a", "p", "t")
        .write.format("cole").mode("overwrite")
        .partitionBy("p").option("bucketBy", "4:a")
        .save(s"$warehouse/bad")
    }
    assert(e.getMessage.contains("not both"))
  }
}
