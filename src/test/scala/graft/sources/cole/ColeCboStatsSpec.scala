package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-level statistics for Spark's cost-based optimizer, computed
  * from COLE footers alone: exact nullCount, min/max folded over page
  * stats, range-based NDV estimates, and value widths. With
  * `spark.sql.cbo.enabled` these surface as catalyst `ColumnStat`s, so
  * join ESTIMATION and cost-based join REORDERING work on `.col` tables
  * the way they do on ANALYZE'd tables — previously the CBO saw only
  * rowCount/sizeInBytes and kept the declared join order.
  */
class ColeCboStatsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** big (40k rows) joins mid (4k, ~1:10 fanin on a) and small (50,
    * selective on b). Declared order joins mid FIRST — the cost-based
    * reorder should pull small forward.
    */
  private lazy val dirs: (String, String, String) = {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("cole_cbo").toString
    (0 until 40000).map(i => (i.toLong % 4000, i.toLong, s"p$i"))
      .toDF("bk_a", "bk_b", "payload")
      .coalesce(1).write.format("cole").mode("overwrite").save(s"$base/big")
    (0 until 4000).map(i => (i.toLong, (i % 7).toDouble))
      .toDF("mk_a", "mv")
      .coalesce(1).write.format("cole").mode("overwrite").save(s"$base/mid")
    (0 until 50).map(i => (i.toLong * 797, s"s$i"))
      .toDF("sk_b", "sv")
      .coalesce(1).write.format("cole").mode("overwrite").save(s"$base/small")
    (s"$base/big", s"$base/mid", s"$base/small")
  }

  test("footer-derived column stats surface as catalyst ColumnStats under CBO") {
    val (big, _, _) = dirs
    withConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.read.format("cole").load(big)
      val stats = df.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(40000)))
      val byName = stats.attributeStats.map { case (a, cs) => a.name -> cs }
      val a = byName("bk_a")
      assert(a.nullCount.contains(BigInt(0)))
      assert(a.min.contains(0L) && a.max.contains(3999L),
        s"bk_a bounds off: ${a.min} .. ${a.max}")
      // dense key space: range NDV is exact
      assert(a.distinctCount.contains(BigInt(4000)), s"bk_a ndv: ${a.distinctCount}")
      val b = byName("bk_b")
      assert(b.distinctCount.contains(BigInt(40000)))
      // string column: width-only (no guessed NDV/bounds)
      val p = byName("payload")
      assert(p.avgLen.isDefined && p.min.isEmpty && p.distinctCount.isEmpty)
    }
  }

  test("CBO join reorder pulls the selective small join forward on .col tables") {
    val (big, mid, small) = dirs
    def query = {
      val b = spark.read.format("cole").load(big)
      val m = spark.read.format("cole").load(mid)
      val sm = spark.read.format("cole").load(small)
      // declared order: (big ⋈ mid) ⋈ small
      b.join(m, b("bk_a") === m("mk_a"))
        .join(sm, b("bk_b") === sm("sk_b"))
        .select(col("payload"), col("mv"), col("sv"))
    }
    // innermost join's right-side relation, identified by its output
    def innermostJoinTables(plan: LogicalPlan): Set[String] = {
      val joins = plan.collect { case j: Join => j }
      val innermost = joins.last // bottom-up order: last = deepest
      innermost.children.flatMap(_.output.map(_.name)).toSet
    }
    val reordered = withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      innermostJoinTables(query.queryExecution.optimizedPlan)
    }
    val declared = withConf("spark.sql.cbo.enabled" -> "false") {
      innermostJoinTables(query.queryExecution.optimizedPlan)
    }
    assert(declared.contains("mk_a") && !declared.contains("sk_b"),
      s"without CBO the declared (big ⋈ mid) order should stand: $declared")
    assert(reordered.contains("sk_b") && !reordered.contains("mk_a"),
      s"CBO should join the 50-row selective side first: $reordered")
    // reorder must not change results
    val rows = withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      query.collect().map(_.toSeq).toSet
    }
    val base = withConf("spark.sql.cbo.enabled" -> "false") {
      query.collect().map(_.toSeq).toSet
    }
    assert(rows === base && rows.nonEmpty)
  }

  /** r12: string NDV from DICTIONARY page headers — a sound upper bound
    * (sum of per-page dictionary entry counts), cached per file
    * incarnation, reported only when every page of the column is an
    * uncompressed dictionary page.
    */
  private lazy val strDirs: (String, String, String) = {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("cole_cbo_str").toString
    // 40k rows over a 200-value string key: dictionary-encoded
    (0 until 40000).map(i => (s"c${i % 200}", i.toLong, s"p$i"))
      .toDF("cat", "n", "payload")
      .coalesce(1).write.format("cole").mode("overwrite").save(s"$base/sbig")
    (0 until 200).map(i => (s"c$i", (i % 7).toDouble)).toDF("mcat", "mv")
      .coalesce(1).write.format("cole").mode("overwrite").save(s"$base/smid")
    (0 until 5).map(i => (s"c${i * 37}", s"s$i")).toDF("scat", "sv")
      .coalesce(1).write.format("cole").mode("overwrite").save(s"$base/ssmall")
    (s"$base/sbig", s"$base/smid", s"$base/ssmall")
  }

  test("string NDV: dictionary-page bound is sound, tight, and cached") {
    val (sbig, _, _) = strDirs
    withConf("spark.sql.cbo.enabled" -> "true") {
      val df = spark.read.format("cole").load(sbig)
      val byName = df.queryExecution.optimizedPlan.stats.attributeStats
        .map { case (a, cs) => a.name -> cs }
      val cat = byName("cat")
      assert(cat.distinctCount.isDefined, "dictionary key must report NDV")
      val ndv = cat.distinctCount.get
      // sound (>= true 200) and far tighter than the 40k rowcount
      assert(ndv >= BigInt(200) && ndv <= BigInt(4000),
        s"cat NDV bound out of range: $ndv")
      // high-cardinality payload is PLAIN-encoded: no bound, never a guess
      assert(byName("payload").distinctCount.isEmpty)
      // the probe is cached per file incarnation: re-planning reads nothing
      val before = ColeNdv.probeReads.get()
      spark.read.format("cole").load(sbig)
        .queryExecution.optimizedPlan.stats
      assert(ColeNdv.probeReads.get() === before,
        "repeated planning must serve NDV bounds from the cache")
    }
  }

  test("string NDV on v2 files is metadata-only: footer bounds, zero probe reads from COLD") {
    // r13: the v2 writer records its own dictionary entry counts in the
    // footer's NDV extension — the CBO bound then needs no positioned
    // read at all, even on first touch; the page probe remains the
    // fallback for pre-extension files (the v1 test above pins it)
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_cbo_v2").toString + "/v2s"
    (0 until 30000).map(i => (s"k${i % 150}", i.toLong))
      .toDF("cat", "n")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("formatVersion", "2").save(dir)
    val info = ColeMetaCache.infos(dir, ColeIO.driverConf()).head
    assert(info.meta.version === 2)
    assert(info.meta.ndvBounds.nonEmpty, "v2 footer must carry NDV bounds")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val before = ColeNdv.probeReads.get()
      val byName = spark.read.format("cole").load(dir)
        .queryExecution.optimizedPlan.stats.attributeStats
        .map { case (a, cs) => a.name -> cs }
      val ndv = byName("cat").distinctCount
      assert(ndv.isDefined, "v2 dictionary key must report NDV")
      assert(ndv.get >= BigInt(150) && ndv.get <= BigInt(3000),
        s"v2 cat NDV bound out of range: ${ndv.get}")
      assert(ColeNdv.probeReads.get() === before,
        "v2 footer bounds must cost ZERO positioned reads, cold included")
    }
  }

  test("string-keyed 3-way join reorders under CBO, results unchanged") {
    val (sbig, smid, ssmall) = strDirs
    def query = {
      val b = spark.read.format("cole").load(sbig)
      val m = spark.read.format("cole").load(smid)
      val sm = spark.read.format("cole").load(ssmall)
      // declared order: (sbig ⋈ smid) ⋈ ssmall — the selective 5-row
      // string-keyed join is declared LAST
      b.join(m, b("cat") === m("mcat"))
        .join(sm, b("cat") === sm("scat"))
        .select(col("n"), col("mv"), col("sv"))
    }
    def innermostJoinTables(plan: LogicalPlan): Set[String] = {
      val joins = plan.collect { case j: Join => j }
      joins.last.children.flatMap(_.output.map(_.name)).toSet
    }
    val reordered = withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      innermostJoinTables(query.queryExecution.optimizedPlan)
    }
    val declared = withConf("spark.sql.cbo.enabled" -> "false") {
      innermostJoinTables(query.queryExecution.optimizedPlan)
    }
    assert(declared.contains("mcat") && !declared.contains("scat"),
      s"without CBO the declared (sbig ⋈ smid) order should stand: $declared")
    assert(reordered.contains("scat") && !reordered.contains("mcat"),
      s"string NDV should let the CBO join the 5-row side first: $reordered")
    val rows = withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true") {
      query.collect().map(_.toSeq).toSet
    }
    val base = withConf("spark.sql.cbo.enabled" -> "false") {
      query.collect().map(_.toSeq).toSet
    }
    assert(rows === base && rows.nonEmpty)
  }
}
