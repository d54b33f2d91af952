package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Read-time type widening (r9): part files disagreeing by INT32/INT64
  * or same-scale DECIMAL precision read under the WIDEST type, per-file
  * lanes adapted at decode (ColeWiden). Claims stay row-exact where the
  * unscaled domain is unchanged; aggregate pushdown declines on mixed
  * columns (and returns after compaction homogenizes); the metadata
  * DELETE fast path declines on lane-mixed predicate columns (the
  * group-based row-level path is always exact); non-widening changes
  * still fail loudly.
  */
class ColeTypeWideningSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_tw_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.tww", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.tww.warehouse", warehouse)
    s
  }

  test("INT32 files + INT64 append read as BIGINT; claims exact; compaction restores pushdown") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_tw_int").toString
    (0 until 1000).map(i => (i, i * 2)).toDF("k", "v")
      .select(col("k").cast(IntegerType), col("v").cast(IntegerType))
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    (1000 until 2000).map(i => (i.toLong * 1000000000L, i.toLong))
      .toDF("k", "v").coalesce(1)
      .write.format("cole").mode("append").save(dir)
    val back = spark.read.format("cole").load(dir)
    assert(back.schema("k").dataType === LongType)
    assert(back.schema("v").dataType === LongType)
    assert(back.count() === 2000L)
    // values exact from both lanes, including beyond int32 range
    assert(back.filter(col("k") === 500L).select("v").head.getLong(0) === 1000L)
    assert(back.filter(col("k") === 1500000000000L).count() === 1L)
    // claimed long predicate applies row-exactly to INT32 chunks too
    val q = back.filter(col("k") >= 500L && col("k") < 1500000000000L)
    assert(q.queryExecution.executedPlan.toString.contains("pushed=["))
    assert(q.count() === 500L + 500L)
    // aggregate pushdown declines on the mixed column (values stay exact)
    val agg = back.agg(sum("v").as("s"), min("k").as("mn"), max("k").as("mx"))
    assert(!agg.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    val r = agg.head()
    assert(r.getLong(0) === (0 until 1000).map(_ * 2L).sum + (1000L until 2000L).sum)
    assert(r.getLong(1) === 0L)
    assert(r.getLong(2) === 1999L * 1000000000L)
    // compaction rewrites under the union schema: homogeneous INT64,
    // pushdown returns
    ColeCompact.compact(s, dir, 512L << 20)
    val agg2 = spark.read.format("cole").load(dir)
      .agg(sum("v").as("s"), min("k").as("mn"), max("k").as("mx"))
    assert(agg2.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "post-compaction homogeneous table must push aggregates again")
    assert(agg2.head() === r)
  }

  test("same-lane DECIMAL precision growth: widest type, claims still push") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_tw_dec").toString
    (0 until 500).map(i => (i.toLong, BigDecimal(i * 100L, 2)))
      .toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(12, 2)).as("m"))
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    (500 until 1000).map(i => (i.toLong, BigDecimal(i * 1000000L, 2)))
      .toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(16, 2)).as("m"))
      .coalesce(1).write.format("cole").mode("append").save(dir)
    val back = spark.read.format("cole").load(dir)
    assert(back.schema("m").dataType === DecimalType(16, 2))
    // unscaled domain unchanged: the decimal claim pushes and is exact
    val q = back.filter(col("m") < lit(BigDecimal("5000000.00")))
    assert(q.queryExecution.executedPlan.toString.contains("pushed=["))
    assert(q.count() ===
      (0 until 500).count(_ * 100L < 500000000L) +
        (500 until 1000).count(_ * 1000000L < 500000000L))
    assert(back.filter(col("k") === 100L).select("m").head.getDecimal(0)
      === new java.math.BigDecimal("100.00"))
    assert(back.filter(col("k") === 900L).select("m").head.getDecimal(0)
      === new java.math.BigDecimal("9000000.00"))
  }

  test("cross-lane widening (DECIMAL 12,2 -> 25,2): exact reads, residual filters, group-path DELETE") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/wide"
    (0 until 400).map(i => (i.toLong, BigDecimal(i * 100L, 2)))
      .toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(12, 2)).as("m"))
      .coalesce(1).write.format("cole").mode("overwrite").save(t)
    // unscaled beyond int64: genuinely wide values
    (400 until 800).map(i =>
        (i.toLong, BigDecimal(new java.math.BigInteger("92233720368547758080").add(
          java.math.BigInteger.valueOf(i)), 2)))
      .toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(25, 2)).as("m"))
      .coalesce(1).write.format("cole").mode("append").save(t)
    val back = spark.table("tww.db.wide")
    assert(back.schema("m").dataType === DecimalType(25, 2))
    assert(back.count() === 800L)
    // narrow-file values surface exactly under the wide type
    assert(back.filter(col("k") === 7L).select("m").head.getDecimal(0)
      === new java.math.BigDecimal("7.00"))
    // wide-file values exact too (unscaled 92233720368547758080 + 400)
    assert(back.filter(col("k") === 400L).select("m").head.getDecimal(0)
      === new java.math.BigDecimal("922337203685477584.80"))
    // a filter on the lane-mixed column stays RESIDUAL but exact
    val f = back.filter(col("m") > lit(BigDecimal("100.00")))
    assert(f.count() === (0 until 400).count(_ * 100L > 10000L) + 400L)
    // DELETE on the lane-mixed column routes to the group-based path
    // (canDeleteWhere declines) and is row-exact
    spark.sql("DELETE FROM tww.db.wide WHERE m < 100.00")
    assert(spark.table("tww.db.wide").count() ===
      800L - (0 until 400).count(_ * 100L < 10000L))
    assert(spark.table("tww.db.wide").filter(col("k") === 400L).count() === 1L)
  }

  test("time travel keeps the PAST's narrower type; live reads widen") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_tw_tt").toString
    (0 until 300).map(i => (i, i * 2)).toDF("k", "v")
      .select(col("k").cast(IntegerType), col("v").cast(IntegerType))
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    ColeVersions.enable(dir, ColeIO.driverConf()) // v1: all INT32
    (300 until 400).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .coalesce(1).write.format("cole").mode("append").save(dir) // v2 widens
    val live = spark.read.format("cole").load(dir)
    assert(live.schema("k").dataType === LongType)
    assert(live.count() === 400L)
    // the snapshot's schema is the UNION of ITS files: still INT32
    val v1 = spark.read.format("cole").option("versionAsOf", "1").load(dir)
    assert(v1.schema("k").dataType === IntegerType,
      "a pinned pre-widening snapshot must keep the narrower type")
    assert(v1.count() === 300L)
    assert(v1.agg(sum("v")).head.getLong(0) === (0 until 300).map(_ * 2L).sum)
  }

  test("non-widening changes still fail loudly") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_tw_bad").toString
    (0 until 10).map(i => (i.toLong, BigDecimal(i, 2))).toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(10, 2)).as("m"))
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    // scale change: silently reinterprets unscaled values — rejected
    (0 until 10).map(i => (i.toLong, BigDecimal(i, 3))).toDF("k", "m")
      .select(col("k"), col("m").cast(DecimalType(10, 3)).as("m"))
      .coalesce(1).write.format("cole").mode("append").save(dir)
    val e = intercept[Exception] { spark.read.format("cole").load(dir).count() }
    assert(e.getMessage.contains("cannot change column"))
  }
}
