package graft.sources.cole

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 aggregate pushdown: global SUM/MIN/MAX/COUNT over numeric COLE
  * columns must be answered from page stats + streaming page sweeps (one
  * partial row per row group), bit-identical to the unpushed plan.
  */
class ColeAggPushdownSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  /** 3 part-less row groups x mixed encodings: ordered (DELTA), runny
    * (RLE), scattered (PLAIN) ints and longs, plus a dict string column.
    */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("cole_aggpush").toString
    val s = spark
    import s.implicits._
    val df = (0 until 30000).map { i =>
      (i, // sorted -> DELTA
        (i / 1000) * 7L, // runny -> RLE
        ((i * 2654435761L) % 100000L - 50000L), // scattered -> PLAIN, negatives
        s"cat_${i % 5}") // low-cardinality -> DICTIONARY
    }.toDF("ord", "runs", "rnd", "cat")
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "8192").save(d)
    d
  }

  private def cole: DataFrame = spark.read.format("cole").load(dir)

  private def scanOf(df: DataFrame): org.apache.spark.sql.connector.read.Scan =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.scan
    }.head

  test("global agg is pushed: one partial row per row group, values exact") {
    val agg = cole.agg(
      sum("ord").as("s_ord"), min("ord").as("mn_ord"), max("ord").as("mx_ord"),
      sum("runs").as("s_runs"), min("runs").as("mn_runs"), max("runs").as("mx_runs"),
      sum("rnd").as("s_rnd"), min("rnd").as("mn_rnd"), max("rnd").as("mx_rnd"),
      count(lit(1)).as("n"), count(col("cat")).as("n_cat"))
    val scan = scanOf(agg)
    assert(scan.isInstanceOf[ColeAggScan], s"expected ColeAggScan, got $scan")
    assert(scan.description().contains("PushedAggregates"))
    val parts = scan.asInstanceOf[ColeAggScan].planInputPartitions()
    assert(parts.map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum === 4,
      "30000 rows at rowGroupSize=8192 -> 4 row groups planned")
    assert(parts.length === 1,
      "4 small row groups pack into one partition (one partial row total)")

    val r = agg.head()
    val n = 30000L
    assert(r.getAs[Long]("n") === n)
    assert(r.getAs[Long]("n_cat") === n)
    assert(r.getAs[Long]("s_ord") === n * (n - 1) / 2)
    assert(r.getAs[Int]("mn_ord") === 0 && r.getAs[Int]("mx_ord") === 29999)
    assert(r.getAs[Long]("s_runs") === (0 until 30000).map(i => (i / 1000) * 7L).sum)
    assert(r.getAs[Long]("mn_runs") === 0L && r.getAs[Long]("mx_runs") === 29L * 7)
    val rnd = (0 until 30000).map(i => (i * 2654435761L) % 100000L - 50000L)
    assert(r.getAs[Long]("s_rnd") === rnd.sum)
    assert(r.getAs[Long]("mn_rnd") === rnd.min && r.getAs[Long]("mx_rnd") === rnd.max)
  }

  test("filtered aggregates push with source-applied predicates, values exact") {
    val filtered = cole.filter(col("ord") >= 10000).agg(sum("rnd").as("s"))
    val scan = scanOf(filtered)
    assert(scan.isInstanceOf[ColeAggScan],
      s"claimed numeric filters must not block aggregate pushdown, got $scan")
    assert(scan.description().contains("AppliedFilters"))
    val expected = (10000 until 30000).map(i => (i * 2654435761L) % 100000L - 50000L).sum
    assert(filtered.head().getAs[Long]("s") === expected)

    // zero matching rows: count 0, sum/min NULL — like an unpushed plan
    val none = cole.filter(col("ord") > 1000000)
      .agg(count(lit(1)).as("n"), sum("rnd").as("s"), min("ord").as("m")).head()
    assert(none.getAs[Long]("n") === 0L)
    assert(none.isNullAt(1) && none.isNullAt(2))

    // filtered GROUP BY pushes too
    val grouped = cole.filter(col("ord") < 10)
      .groupBy("cat").agg(count(lit(1)).as("n"))
    assert(scanOf(grouped).isInstanceOf[ColeAggScan])
    assert(grouped.collect().map(r =>
      r.getAs[String]("cat") -> r.getAs[Long]("n")).toMap ===
      (0 until 10).groupBy(i => s"cat_${i % 5}").map { case (k, v) => k -> v.size.toLong })
  }

  test("group-by over a dict string key pushes and matches exact values") {
    val grouped = cole.groupBy("cat").agg(
      sum("rnd").as("s"), count(col("ord")).as("n"),
      min("ord").as("mn"), max("ord").as("mx"))
    val scan = scanOf(grouped)
    assert(scan.isInstanceOf[ColeAggScan], s"expected grouped ColeAggScan, got $scan")
    assert(scan.description().contains("PushedGroupBy"))
    val rows = grouped.collect().map(r => r.getAs[String]("cat") ->
      ((r.getAs[Long]("s"), r.getAs[Long]("n"), r.getAs[Int]("mn"), r.getAs[Int]("mx")))).toMap
    val expected = (0 until 30000).groupBy(i => s"cat_${i % 5}").map { case (k, is) =>
      k -> ((is.map(i => (i * 2654435761L) % 100000L - 50000L).sum,
        is.size.toLong, is.min, is.max))
    }
    assert(rows === expected)
  }

  test("group-by over numeric keys (general path) matches exact values") {
    val grouped = cole.groupBy("runs").agg(sum("ord").as("s"))
    assert(scanOf(grouped).isInstanceOf[ColeAggScan])
    val rows = grouped.collect().map(r => r.getAs[Long]("runs") -> r.getAs[Long]("s")).toMap
    val expected = (0 until 30000).groupBy(i => (i / 1000) * 7L)
      .map { case (k, is) => k -> is.map(_.toLong).sum }
    assert(rows === expected)
  }

  test("unsupported aggregates fall back; string MIN pushes global and grouped") {
    val d = cole.agg(countDistinct(col("cat")).as("n"))
    assert(scanOf(d).isInstanceOf[ColeScan], "COUNT DISTINCT cannot be pushed")
    assert(d.head().getAs[Long]("n") === 5L)

    // string MIN/MAX pushes: globally answered from dictionary entries /
    // value sweeps, grouped via byte-array accumulator slots per key
    val sm = cole.agg(min("cat").as("m"))
    assert(scanOf(sm).isInstanceOf[ColeAggScan], "global string MIN should push")
    assert(sm.head().getAs[String]("m") === "cat_0")
    val gm = cole.groupBy("runs").agg(min("cat").as("m"), max("cat").as("x"))
    assert(scanOf(gm).isInstanceOf[ColeAggScan], "grouped string MIN should push")
    val rows = gm.collect().map(r => r.getAs[Long]("runs") ->
      ((r.getAs[String]("m"), r.getAs[String]("x")))).toMap
    val expected = (0 until 30000).groupBy(i => (i / 1000) * 7L)
      .map { case (k, is) =>
        val cats = is.map(i => s"cat_${i % 5}")
        k -> ((cats.min, cats.max))
      }
    assert(rows === expected)
  }

  test("count() over a pushed agg (empty pruned aggregate list) still works") {
    // an outer count() prunes the inner agg's expressions to an empty
    // list before pushdown — regression: returning true for it broke
    // Spark's column-count contract
    assert(cole.agg(sum("rnd").as("s"), max("ord").as("m")).count() === 1L)
  }

  test("LIMIT plans only enough row groups; filters disable the truncation") {
    val limited = cole.limit(100)
    val scan = scanOf(limited).asInstanceOf[ColeScan]
    assert(scan.description().contains("PushedLimit: 100"))
    val planned = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    assert(planned === 1, s"100 rows need 1 of 4 row groups, planned $planned")
    assert(limited.count() === 100)

    // with a filter the limit cannot prune row groups (rows may be dropped)
    val filtered = cole.filter(col("rnd") > 0).limit(100)
    val fs = scanOf(filtered).asInstanceOf[ColeScan]
    val fPlanned = fs.toBatch.planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    assert(fPlanned === 4, "filtered limit must keep all row groups")
    assert(filtered.count() === 100)
  }

  test("ORDER BY + LIMIT prunes row groups by stats, result exact") {
    // ord is sorted across the file -> row-group ranges are disjoint; the
    // top 50 DESC live entirely in the last of 4 row groups
    val top = cole.orderBy(col("ord").desc).limit(50).select("ord", "rnd")
    val scan = scanOf(top).asInstanceOf[ColeScan]
    assert(scan.description().contains("PushedTopN"), scan.description())
    val planned = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    assert(planned === 1, s"top-50 DESC needs 1 of 4 row groups, planned $planned")
    assert(top.collect().map(_.getAs[Int]("ord")).toSeq ===
      (29999 to 29950 by -1).toSeq)

    val bottom = cole.orderBy(col("ord").asc).limit(10).select("ord")
    val bs = scanOf(bottom).asInstanceOf[ColeScan]
    assert(bs.toBatch.planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum === 1)
    assert(bottom.collect().map(_.getAs[Int]("ord")).toSeq === (0 until 10).toSeq)

    // a scattered column's ranges overlap everywhere: nothing prunable,
    // but the result must still be exact
    val scattered = cole.orderBy(col("rnd").desc).limit(5).select("rnd")
    val expected = (0 until 30000).map(i => (i * 2654435761L) % 100000L - 50000L)
      .sorted(Ordering[Long].reverse).take(5)
    assert(scattered.collect().map(_.getAs[Long]("rnd")).toSeq === expected)
  }

  test("review regressions: MinValue stats, IsNotNull+limit, empty-table count") {
    val s = spark
    import s.implicits._
    // Long.MinValue in a row-group's stats must not corrupt the TopN
    // threshold (negating it overflows): top-2 DESC lives in the last
    // group, while an earlier group holds MinValue rows
    val d1 = java.nio.file.Files.createTempDirectory("cole_minval").toString
    ((Seq.fill(10)(Long.MinValue) ++ (0L until 10L) ++ (100L until 110L))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("id", "v").coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "10").save(d1)
    val top = spark.read.format("cole").load(d1).orderBy(col("v").desc).limit(2)
    assert(top.collect().map(_.getAs[Long]("v")).toSeq === Seq(109L, 108L))

    // claimed IsNotNull drops nothing, so LIMIT must still prune planning
    val limited = cole.filter(col("ord").isNotNull).limit(100)
    val scan = scanOf(limited).asInstanceOf[ColeScan]
    assert(scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum === 1,
      "IsNotNull must not disable limit row-group pruning")
    assert(limited.count() === 100)

    // an empty table still answers a pushed global count with 0, not NULL
    val d2 = java.nio.file.Files.createTempDirectory("cole_empty_agg").toString
    Seq((1L, 2L)).toDF("a", "b").filter(col("a") < 0)
      .repartition(1).write.format("cole").mode("overwrite").save(d2)
    val empty = spark.read.format("cole").load(d2)
    assert(empty.agg(count(lit(1)).as("n")).head().getAs[Long]("n") === 0L)
    val r = empty.agg(sum("a").as("s"), min("b").as("m")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  /** v2 null-bearing table: aggregation must still push (the round-6
    * lever) and match exact SQL null semantics — COUNT(col) skips nulls,
    * SUM/MIN/MAX ignore them, NULL group keys form their own group,
    * all-NULL groups emit NULL, claimed IsNotNull is enforced.
    */
  private lazy val nullDir: String = {
    val d = Files.createTempDirectory("cole_aggpush_null").toString
    val s = spark
    import s.implicits._
    val df = (0 until 30000).map { i =>
      (i.toLong,
        if (i % 7 == 0) None else Some(i.toLong * 3), // nullable long
        if (i % 5 == 0) None else Some(i * 0.25), // nullable double
        if (i % 11 == 0) None else Some(s"g_${i % 4}"), // nullable group key
        s"k_${i % 3}") // dense group key
    }.toDF("id", "v", "d", "g", "k")
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("formatVersion", "2").option("rowGroupSize", "8192").save(d)
    d
  }

  private def coleNull: DataFrame = spark.read.format("cole").load(nullDir)

  test("null-bearing v2 table: global aggregates push with exact null semantics") {
    val agg = coleNull.agg(
      count(lit(1)).as("n"), count(col("v")).as("n_v"), count(col("d")).as("n_d"),
      sum("v").as("s_v"), min("v").as("mn_v"), max("v").as("mx_v"),
      min("d").as("mn_d"), max("d").as("mx_d"), min("g").as("mn_g"))
    assert(scanOf(agg).isInstanceOf[ColeAggScan],
      "null-bearing tables must not lose aggregate pushdown")
    val r = agg.head()
    val present = (0 until 30000).filter(_ % 7 != 0)
    assert(r.getAs[Long]("n") === 30000L)
    assert(r.getAs[Long]("n_v") === present.size.toLong)
    assert(r.getAs[Long]("n_d") === (0 until 30000).count(_ % 5 != 0).toLong)
    assert(r.getAs[Long]("s_v") === present.map(_.toLong * 3).sum)
    assert(r.getAs[Long]("mn_v") === 3L && r.getAs[Long]("mx_v") === 29999L * 3)
    assert(r.getAs[Double]("mn_d") === 0.25 && r.getAs[Double]("mx_d") === 29999 * 0.25)
    assert(r.getAs[String]("mn_g") === "g_0")
  }

  test("null-bearing v2 table: grouped aggregates push, NULL key groups") {
    val grouped = coleNull.groupBy("g").agg(
      count(lit(1)).as("n"), count(col("v")).as("n_v"),
      sum("v").as("s"), min("d").as("mn_d"))
    assert(scanOf(grouped).isInstanceOf[ColeAggScan])
    val rows = grouped.collect().map { r =>
      Option(r.getAs[String]("g")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_v"), r.getAs[Long]("s"),
          if (r.isNullAt(r.fieldIndex("mn_d"))) None else Some(r.getAs[Double]("mn_d"))))
    }.toMap
    val expected = (0 until 30000)
      .groupBy(i => if (i % 11 == 0) None else Some(s"g_${i % 4}"))
      .map { case (k, is) =>
        val vs = is.filter(_ % 7 != 0).map(_.toLong * 3)
        val ds = is.filter(_ % 5 != 0).map(_ * 0.25)
        k -> ((is.size.toLong, vs.size.toLong, vs.sum,
          if (ds.isEmpty) None else Some(ds.min)))
      }
    assert(rows === expected)
    assert(rows.contains(None), "NULL group key must form its own group")
  }

  test("null-bearing v2 table: all-NULL group emits NULL aggregates") {
    val s = spark
    import s.implicits._
    val d = Files.createTempDirectory("cole_aggpush_allnull").toString
    (0 until 100).map { i =>
      (s"k_${i % 2}", if (i % 2 == 0) None else Some(i.toLong))
    }.toDF("k", "v").coalesce(1).write.format("cole").mode("overwrite")
      .option("formatVersion", "2").save(d)
    val df = spark.read.format("cole").load(d)
    val grouped = df.groupBy("k").agg(sum("v").as("s"), min("v").as("m"),
      count(col("v")).as("n"))
    assert(scanOf(grouped).isInstanceOf[ColeAggScan])
    val byKey = grouped.collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(byKey("k_0").isNullAt(1) && byKey("k_0").isNullAt(2))
    assert(byKey("k_0").getAs[Long]("n") === 0L)
    assert(byKey("k_1").getAs[Long]("s") === (1 until 100 by 2).map(_.toLong).sum)
    assert(byKey("k_1").getAs[Long]("n") === 50L)
  }

  test("claimed IsNotNull is enforced by the pushed aggregate") {
    val agg = coleNull.filter(col("v").isNotNull)
      .agg(count(lit(1)).as("n"), count(col("d")).as("n_d"))
    assert(scanOf(agg).isInstanceOf[ColeAggScan],
      s"IsNotNull must not block aggregate pushdown")
    val r = agg.head()
    val kept = (0 until 30000).filter(_ % 7 != 0)
    assert(r.getAs[Long]("n") === kept.size.toLong,
      "COUNT(*) under IS NOT NULL must exclude null rows")
    assert(r.getAs[Long]("n_d") === kept.count(_ % 5 != 0).toLong)

    // filtered + null-skipping sums together
    val f = coleNull.filter(col("id") >= 10000).agg(sum("v").as("s"),
      count(col("g")).as("n_g"))
    assert(scanOf(f).isInstanceOf[ColeAggScan])
    val fr = f.head()
    assert(fr.getAs[Long]("s") ===
      (10000 until 30000).filter(_ % 7 != 0).map(_.toLong * 3).sum)
    assert(fr.getAs[Long]("n_g") === (10000 until 30000).count(_ % 11 != 0).toLong)
  }

  test("pushed and unpushed plans agree on the reference-written fixture") {
    val fixture = getClass.getResource("/ref_fixture.col").getPath
    val df = spark.read.format("cole").load(fixture)
    val pushed = df.agg(sum("value"), min("value"), max("value"), count(lit(1))).head()
    assert(scanOf(df.agg(sum("value"))).isInstanceOf[ColeAggScan])
    // reference CLI ground truth: sum=24962733 min=1 max=9998, 5000 rows
    assert(pushed.getLong(0) === 24962733L)
    assert(pushed.getLong(1) === 1L)
    assert(pushed.getLong(2) === 9998L)
    assert(pushed.getLong(3) === 5000L)
  }

  test("wide DECIMAL(25,4): SUM/MIN/MAX push down via the int128 sweep") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val d = Files.createTempDirectory("cole_aggpush_wide").toString
    // unscaled magnitudes beyond int64 (ledger-sized), negatives included
    val df = (0 until 20000).map { i =>
      (i.toLong, s"acct_${i % 4}",
        (BigDecimal(123456789012345678L, 4) * (i % 7 - 3)) +
          BigDecimal(i.toLong, 4))
    }.toDF("id", "acct", "amt")
      .select(col("id"), col("acct"), col("amt").cast(DecimalType(25, 4)).as("amt"))
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "4096").save(d)
    val cole = spark.read.format("cole").load(d)
    // global: pushed, exact
    val g = cole.agg(sum("amt").as("s"), min("amt").as("mn"), max("amt").as("mx"))
    assert(scanOf(g).isInstanceOf[ColeAggScan], "wide agg must push")
    assert(g.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(g.head() === df.agg(sum("amt"), min("amt"), max("amt")).head())
    // grouped: pushed, exact per key
    val gg = cole.groupBy("acct").agg(sum("amt").as("s"), min("amt").as("mn"))
    assert(scanOf(gg).isInstanceOf[ColeAggScan], "grouped wide agg must push")
    assert(gg.collect().map(_.toSeq).toSet ===
      df.groupBy("acct").agg(sum("amt").as("s"), min("amt").as("mn"))
        .collect().map(_.toSeq).toSet)
    // filtered: claimed wide predicate + pushed aggregate compose
    val f = cole.filter(col("amt") > lit(BigDecimal("0.0000")))
      .agg(sum("amt").as("s"), count(lit(1)).as("c"))
    assert(scanOf(f).isInstanceOf[ColeAggScan])
    assert(f.head() === df.filter(col("amt") > lit(BigDecimal("0.0000")))
      .agg(sum("amt"), count(lit(1))).head())
    // min/max WITHOUT sum answers from (hi,lo) page stats alone
    val mm = cole.agg(min("amt").as("mn"), max("amt").as("mx"))
    assert(scanOf(mm).isInstanceOf[ColeAggScan])
    assert(mm.head() === df.agg(min("amt"), max("amt")).head())
  }
}
