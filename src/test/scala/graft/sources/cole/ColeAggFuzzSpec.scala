package graft.sources.cole

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for aggregate pushdown: seeded random datasets
  * (sizes straddling row-group boundaries, negative values, skewed
  * groups) written to `.col`, then every pushed aggregate shape is
  * compared row-for-row against Spark's own aggregation of the source
  * DataFrame (which never touches the pushdown path).
  */
class ColeAggFuzzSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("pushed aggregates == DataFrame aggregates across seeded datasets") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1, 7, 23); n <- Seq(1, 100, 8192, 8193, 20000)) {
      val rnd = new scala.util.Random(seed)
      val nGroups = 1 + rnd.nextInt(8)
      val rows = (0 until n).map { i =>
        (rnd.nextLong() % 1000000L, rnd.nextInt(2000) - 1000,
          s"g${rnd.nextInt(nGroups)}", i.toLong)
      }
      val df = rows.toDF("v_long", "v_int", "grp", "id")
      val dir = Files.createTempDirectory(s"cole_aggfuzz_${seed}_$n").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("rowGroupSize", "8192").save(dir)
      val cole = s.read.format("cole").load(dir)

      val g = cole.agg(sum("v_long").as("s"), min("v_long").as("mn"),
        max("v_int").as("mx"), count(col("grp")).as("c")).head()
      val e = df.agg(sum("v_long"), min("v_long"), max("v_int"), count(col("grp"))).head()
      assert(g === e, s"global agg diverged (seed=$seed n=$n)")

      val gb = cole.groupBy("grp").agg(sum("v_int").as("s"), min("v_long").as("mn"),
          max("v_long").as("mx"), count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      val eb = df.groupBy("grp").agg(sum("v_int"), min("v_long"),
          max("v_long"), count(lit(1)))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(gb === eb, s"grouped agg diverged (seed=$seed n=$n groups=$nGroups)")

      val gi = cole.groupBy("id").agg(sum("v_int").as("s")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ei = df.groupBy("id").agg(sum("v_int")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gi === ei, s"high-cardinality grouped agg diverged (seed=$seed n=$n)")

      // claimed filters: random conjunctive predicates through scan,
      // global agg, and grouped agg — all row-exact vs the DataFrame
      val lo = rnd.nextInt(2000) - 1000
      val hi = lo + rnd.nextInt(500)
      def f(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("v_int") >= lo && col("v_int") < hi)
      assert(f(cole).collect().map(_.toSeq).toSet ===
        f(df).collect().map(_.toSeq).toSet,
        s"filtered scan diverged (seed=$seed n=$n [$lo,$hi))")
      assert(f(cole).agg(count(lit(1)), sum("v_long"), min("v_long")).head() ===
        f(df).agg(count(lit(1)), sum("v_long"), min("v_long")).head(),
        s"filtered global agg diverged (seed=$seed n=$n [$lo,$hi))")
      assert(f(cole).groupBy("grp").agg(sum("v_long").as("s"), count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap ===
        f(df).groupBy("grp").agg(sum("v_long").as("s"), count(lit(1)).as("c"))
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap,
        s"filtered grouped agg diverged (seed=$seed n=$n [$lo,$hi))")

      // claimed string equality: grp is low-cardinality (dictionary path);
      // targets past nGroups exercise the value-absent row-group skip
      val gsel = s"g${rnd.nextInt(nGroups + 2)}"
      def fs(d: org.apache.spark.sql.DataFrame) = d.filter(col("grp") === gsel)
      assert(fs(cole).collect().map(_.toSeq).toSet ===
        fs(df).collect().map(_.toSeq).toSet,
        s"string-filtered scan diverged (seed=$seed n=$n grp=$gsel)")
      assert(fs(cole).agg(count(lit(1)), sum("v_long")).head() ===
        fs(df).agg(count(lit(1)), sum("v_long")).head(),
        s"string-filtered agg diverged (seed=$seed n=$n grp=$gsel)")
      def fsn(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("grp") === gsel && col("v_int") >= lo && col("v_int") < hi)
      assert(fsn(cole).collect().map(_.toSeq).toSet ===
        fsn(df).collect().map(_.toSeq).toSet,
        s"string+numeric filter diverged (seed=$seed n=$n grp=$gsel [$lo,$hi))")

      // claimed IN filters: numeric membership (some values absent) and
      // string membership against the dictionary path
      val inVals = Seq.fill(5)(rnd.nextInt(2400) - 1200)
      def fin(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("v_int").isin(inVals: _*))
      assert(fin(cole).collect().map(_.toSeq).toSet ===
        fin(df).collect().map(_.toSeq).toSet,
        s"numeric IN diverged (seed=$seed n=$n in=$inVals)")
      def fins(d: org.apache.spark.sql.DataFrame) =
        d.filter(col("grp").isin("g0", "g2", "absent"))
      assert(fins(cole).collect().map(_.toSeq).toSet ===
        fins(df).collect().map(_.toSeq).toSet,
        s"string IN diverged (seed=$seed n=$n)")
      assert(fins(cole).agg(count(lit(1)), sum("v_long")).head() ===
        fins(df).agg(count(lit(1)), sum("v_long")).head(),
        s"string-IN agg diverged (seed=$seed n=$n)")

      // claimed negation + string pattern predicates + same-column ORs
      for (fc <- Seq(col("grp") =!= gsel, col("v_int") =!= lo,
          col("grp").startsWith("g1"), col("grp").endsWith("2"),
          col("grp").contains("3"),
          col("v_int") < lo || col("v_int") >= hi,
          col("grp") === gsel || col("grp").endsWith("1"),
          col("v_int") === lo || col("v_int") === hi || col("v_int") > 900)) {
        assert(cole.filter(fc).count() === df.filter(fc).count(),
          s"predicate $fc diverged (seed=$seed n=$n)")
      }
      // cross-column OR stays residual but exact
      val cross = col("v_int") < lo || col("grp") === gsel
      assert(cole.filter(cross).count() === df.filter(cross).count(),
        s"cross-column OR diverged (seed=$seed n=$n)")
    }
  }

  test("null fuzz: pushed aggregates == DataFrame aggregates under v2 null masks") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(2, 13); n <- Seq(1, 100, 8192, 8193, 20000)) {
      val rnd = new scala.util.Random(seed)
      val nGroups = 1 + rnd.nextInt(6)
      val pNull = 0.05 + rnd.nextDouble() * 0.85 // sparse and dense masks alike
      def mask[T](v: => T): Option[T] = if (rnd.nextDouble() < pNull) None else Some(v)
      val rows = (0 until n).map { i =>
        (i.toLong,
          mask(rnd.nextLong() % 100000L),
          mask(rnd.nextInt(1000) - 500),
          mask((rnd.nextInt(2000) - 1000) * 0.5),
          mask(s"g${rnd.nextInt(nGroups)}"))
      }
      val df = rows.toDF("id", "vl", "vi", "vd", "grp")
      val dir = Files.createTempDirectory(s"cole_nullfuzz_${seed}_$n").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("formatVersion", "2").option("rowGroupSize", "4096").save(dir)
      val cole = s.read.format("cole").load(dir)

      // the null-bearing table must still take the pushed-aggregate path
      val probe = cole.agg(sum("vl"))
      assert(probe.queryExecution.executedPlan.toString.contains("PushedAggregates"),
        s"null-bearing v2 table lost aggregate pushdown (seed=$seed n=$n)")

      def aggSet(d: org.apache.spark.sql.DataFrame) = d.agg(
        count(lit(1)).as("c"), count(col("vl")).as("cl"), count(col("vd")).as("cd"),
        count(col("grp")).as("cg"), sum("vl").as("sl"), min("vl").as("ml"),
        max("vl").as("xl"), sum("vi").as("si"), sum("vd").as("sd"),
        min("vd").as("md"), max("vd").as("xd"), min("grp").as("mg"),
        max("grp").as("xg"))
      assert(aggSet(cole).head() === aggSet(df).head(),
        s"global null agg diverged (seed=$seed n=$n pNull=$pNull)")

      def grpSet(d: org.apache.spark.sql.DataFrame) = d.groupBy("grp").agg(
          count(lit(1)).as("c"), count(col("vl")).as("cl"), sum("vl").as("s"),
          min("vi").as("m"), max("vd").as("x"))
        .collect().map(r => Option(r.getString(0)) -> r.toSeq.tail).toMap
      assert(grpSet(cole) === grpSet(df),
        s"grouped null agg diverged (seed=$seed n=$n pNull=$pNull groups=$nGroups)")

      // claimed filters over null-bearing columns: nulls fail comparisons,
      // IsNotNull enforced, aggregates stay exact
      val lo = rnd.nextInt(1000) - 500
      for (fc <- Seq(col("vi") >= lo, col("vl").isNotNull,
          col("vi").isNotNull && col("vi") < lo, col("grp") === "g0")) {
        def f(d: org.apache.spark.sql.DataFrame) = d.filter(fc)
          .agg(count(lit(1)).as("c"), count(col("vd")).as("cd"),
            sum("vl").as("s"), min("vl").as("m"))
        assert(f(cole).head() === f(df).head(),
          s"filtered null agg diverged (seed=$seed n=$n filter=$fc)")
        assert(cole.filter(fc).count() === df.filter(fc).count(),
          s"filtered count diverged (seed=$seed n=$n filter=$fc)")
      }

      // high-cardinality grouped (flush path) with nullable values
      val gi = cole.groupBy("id").agg(sum("vl").as("s"), count(col("vl")).as("c"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val ei = df.groupBy("id").agg(sum("vl").as("s"), count(col("vl")).as("c"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(gi === ei, s"high-card grouped null agg diverged (seed=$seed n=$n)")
    }
  }

  test("decimal fuzz: roundtrip, pushed filters and aggregates == DataFrame path") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    for (seed <- Seq(3, 17); n <- Seq(1, 100, 8192, 8193, 20000)) {
      val rnd = new scala.util.Random(seed)
      val nGroups = 1 + rnd.nextInt(6)
      val pNull = rnd.nextDouble() * 0.3
      def mask[T](v: => T): Option[T] = if (rnd.nextDouble() < pNull) None else Some(v)
      val rows = (0 until n).map { i =>
        (i.toLong,
          mask(BigDecimal(rnd.nextLong() % 10000000L, 2)), // DECIMAL(12,2), negatives
          mask(BigDecimal(rnd.nextInt(2000000) - 1000000, 3)), // DECIMAL(8,3): int lane
          s"g${rnd.nextInt(nGroups)}")
      }
      val df0 = rows.toDF("id", "m", "sm", "grp")
      val df = df0.select(col("id"), col("m").cast(DecimalType(12, 2)).as("m"),
        col("sm").cast(DecimalType(8, 3)).as("sm"), col("grp"))
      val dir = Files.createTempDirectory(s"cole_decfuzz_${seed}_$n").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("rowGroupSize", "4096").save(dir)
      val cole = s.read.format("cole").load(dir)

      assert(cole.schema("m").dataType === DecimalType(12, 2), "schema roundtrip")
      assert(cole.schema("sm").dataType === DecimalType(8, 3),
        "small-precision schema roundtrip")
      assert(cole.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet,
        s"decimal roundtrip diverged (seed=$seed n=$n)")

      // pushed decimal aggregates, global + grouped
      val probe = cole.agg(sum("m"))
      assert(probe.queryExecution.executedPlan.toString.contains("PushedAggregates"),
        s"decimal table lost aggregate pushdown (seed=$seed n=$n)")
      def aggSet(d: org.apache.spark.sql.DataFrame) = d.agg(
        count(lit(1)).as("c"), count(col("m")).as("cm"),
        sum("m").as("s"), min("m").as("mn"), max("m").as("mx"),
        sum("sm").as("ss"), min("sm").as("smn"), max("sm").as("smx")).head()
      assert(aggSet(cole) === aggSet(df),
        s"global decimal agg diverged (seed=$seed n=$n)")
      def grpSet(d: org.apache.spark.sql.DataFrame) = d.groupBy("grp").agg(
          sum("m").as("s"), min("m").as("mn"), max("sm").as("mx"),
          count(col("m")).as("c"))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(grpSet(cole) === grpSet(df),
        s"grouped decimal agg diverged (seed=$seed n=$n)")

      // claimed decimal predicates: range/eq/IN rewrite to the unscaled
      // domain and must stay row-exact, including under the agg path
      val pivot = BigDecimal(rnd.nextLong() % 10000000L, 2)
      val inVals = Seq.fill(4)(BigDecimal(rnd.nextLong() % 10000000L, 2))
      for (fc <- Seq(col("m") < lit(pivot), col("m") >= lit(pivot),
          col("m") === lit(pivot), col("m").isNotNull && col("m") =!= lit(pivot),
          col("m").isin(inVals: _*),
          col("m") < lit(pivot) || col("m") > lit(pivot + 1000),
          col("sm") >= lit(BigDecimal(0)))) {
        assert(cole.filter(fc).count() === df.filter(fc).count(),
          s"decimal predicate $fc count diverged (seed=$seed n=$n)")
        def f(d: org.apache.spark.sql.DataFrame) = d.filter(fc)
          .agg(count(lit(1)).as("c"), sum("m").as("s"), min("m").as("mn")).head()
        assert(f(cole) === f(df),
          s"decimal filtered agg diverged (seed=$seed n=$n filter=$fc)")
      }
      // a literal finer than the column scale cannot claim through
      // rounding: it must stay residual AND stay correct
      val fine = col("m") > lit(BigDecimal("1.005"))
      assert(cole.filter(fine).count() === df.filter(fine).count(),
        s"sub-scale literal diverged (seed=$seed n=$n)")

      // pushed TopN on the decimal column (unscaled order == value order)
      val topCole = cole.orderBy(col("m").desc_nulls_last).limit(7).select("id", "m")
        .collect().map(_.toSeq)
      val topDf = df.orderBy(col("m").desc_nulls_last).limit(7).select("id", "m")
        .collect().map(_.toSeq)
      assert(topCole.toSeq === topDf.toSeq,
        s"decimal TopN diverged (seed=$seed n=$n)")
    }
  }

  test("decimal SUM pushdown declines when partials could exceed DecimalType(p)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    // 20 values of ~9.2e17 unscaled: the true sum (~1.8e19) needs more
    // digits than DECIMAL(18, 0) holds. Spark's partial-pushdown rewrite
    // casts pushed partials back to the COLUMN type, so pushing here
    // would overflow (ANSI error) where the unpushed plan succeeds —
    // planning must prove rows × max|unscaled| < 10^p from footer stats
    // and DECLINE, and the Spark-side aggregate must stay exact
    val df = (0 until 20).map(_ => BigDecimal(920000000000000000L))
      .toDF("m").select(col("m").cast(DecimalType(18, 0)).as("m"))
    val dir = Files.createTempDirectory("cole_decoverflow").toString
    df.coalesce(1).write.format("cole").mode("overwrite").save(dir)
    val q = s.read.format("cole").load(dir).agg(sum("m").as("s"))
    assert(!q.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "a sum that cannot prove its partials fit must not push")
    assert(q.head() === df.agg(sum("m").as("s")).head())
    // and a provably-fitting sum on the same precision still pushes
    val small = (0 until 1000).map(i => BigDecimal(i.toLong)).toDF("m")
      .select(col("m").cast(DecimalType(18, 0)).as("m"))
    val dir2 = Files.createTempDirectory("cole_decfits").toString
    small.coalesce(1).write.format("cole").mode("overwrite").save(dir2)
    val q2 = s.read.format("cole").load(dir2).agg(sum("m").as("s"))
    assert(q2.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "a provably-fitting sum must push")
    assert(q2.head() === small.agg(sum("m").as("s")).head())
  }

  test("wide decimal (precision>18) fuzz: roundtrip, claimed predicates, aggregates") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    // lane round-trip boundaries first: sign, lane edges, 38-digit extremes
    for (bi <- Seq(BigInt(0), BigInt(-1), BigInt(1), BigInt(Long.MaxValue),
        BigInt(Long.MinValue), BigInt(Long.MaxValue) + 1, BigInt(Long.MinValue) - 1,
        BigInt(10).pow(38) - 1, -(BigInt(10).pow(38) - 1))) {
      val (hi, lo) = ColeFormat.wideFromBigInteger(bi.bigInteger)
      assert(ColeFormat.wideToBigInteger(hi, lo) === bi.bigInteger,
        s"lane roundtrip broke for $bi")
    }
    for (seed <- Seq(5, 23); n <- Seq(1, 100, 8192, 8193, 20000)) {
      val rnd = new scala.util.Random(seed)
      val pNull = rnd.nextDouble() * 0.3
      def mask[T](v: => T): Option[T] = if (rnd.nextDouble() < pNull) None else Some(v)
      // unscaled magnitudes beyond int64: up to 83 bits (< 10^25) and
      // 126 bits (< 10^38), negatives included
      def wideBD(bits: Int, scale: Int): BigDecimal = {
        val mag = BigInt(rnd.nextInt(bits + 1), rnd)
        BigDecimal(if (rnd.nextBoolean()) mag else -mag, scale)
      }
      val nGroups = 1 + rnd.nextInt(6)
      // explicit schema: the tuple encoder's DECIMAL(38,18) default cannot
      // hold 25 integral digits
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("w", DecimalType(25, 4), nullable = true),
        StructField("ww", DecimalType(38, 10), nullable = true),
        StructField("grp", StringType, nullable = false)))
      val rows = (0 until n).map { i =>
        Row(i.toLong, mask(wideBD(83, 4)).map(_.bigDecimal).orNull,
          mask(wideBD(126, 10)).map(_.bigDecimal).orNull,
          s"g${rnd.nextInt(nGroups)}")
      }
      val df = s.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)
      val dir = Files.createTempDirectory(s"cole_widefuzz_${seed}_$n").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("rowGroupSize", "4096").save(dir)
      val cole = s.read.format("cole").load(dir)

      assert(cole.schema("w").dataType === DecimalType(25, 4), "schema roundtrip")
      assert(cole.schema("ww").dataType === DecimalType(38, 10), "schema roundtrip 38")
      assert(cole.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet,
        s"wide decimal roundtrip diverged (seed=$seed n=$n)")

      // wide aggregates push down when planning can PROVE the partials
      // fit DECIMAL(p) (rows × max|unscaled| < 10^p); this adversarial
      // data saturates 25 digits, so SUM correctly declines for larger n
      // while MIN/MAX (always p-sized) push — either way values must
      // agree exactly with the DataFrame twin
      def aggSet(d: org.apache.spark.sql.DataFrame) = d.agg(
        count(lit(1)).as("c"), count(col("w")).as("cw"),
        sum("w").as("s"), min("w").as("mn"), max("w").as("mx"),
        min("ww").as("wmn"), max("ww").as("wmx")).head()
      assert(aggSet(cole) === aggSet(df),
        s"wide decimal agg diverged (seed=$seed n=$n)")
      assert(cole.agg(min("w"), max("w")).queryExecution.executedPlan
        .toString.contains("PushedAggregates"),
        "wide decimal MIN/MAX must push down (int128 lane stats)")
      // grouped wide aggregates agree exactly (pushed where provable)
      def gAggSet(d: org.apache.spark.sql.DataFrame) = d.groupBy("grp")
        .agg(count(lit(1)).as("c"), sum("w").as("s"), min("w").as("mn"),
          max("ww").as("wmx")).collect().map(_.toSeq).toSet
      assert(gAggSet(cole) === gAggSet(df),
        s"grouped wide decimal agg diverged (seed=$seed n=$n)")

      // claimed predicates in the int128 unscaled domain: row-exact
      // through stats skipping + selection vectors
      val pivot = wideBD(83, 4)
      for (fc <- Seq(col("w") < lit(pivot), col("w") >= lit(pivot),
          col("w") === lit(pivot), col("w").isNotNull && col("w") =!= lit(pivot),
          col("w") < lit(pivot) || col("w") > lit(pivot + 1000),
          col("ww") >= lit(BigDecimal(0).setScale(10)))) {
        assert(cole.filter(fc).count() === df.filter(fc).count(),
          s"wide predicate $fc count diverged (seed=$seed n=$n)")
        def f(d: org.apache.spark.sql.DataFrame) = d.filter(fc)
          .agg(count(lit(1)).as("c"), sum("w").as("s"), min("ww").as("mn")).head()
        assert(f(cole) === f(df),
          s"wide filtered agg diverged (seed=$seed n=$n filter=$fc)")
      }
      // a literal finer than the column scale cannot claim through
      // rounding: it must stay residual AND stay correct
      val fine = col("w") > lit(BigDecimal("1.00005"))
      assert(cole.filter(fine).count() === df.filter(fine).count(),
        s"sub-scale wide literal diverged (seed=$seed n=$n)")

      // ordering through the columnar binary lane must match value order
      val topCole = cole.orderBy(col("w").desc_nulls_last).limit(7).select("id", "w")
        .collect().map(_.toSeq)
      val topDf = df.orderBy(col("w").desc_nulls_last).limit(7).select("id", "w")
        .collect().map(_.toSeq)
      assert(topCole.toSeq === topDf.toSeq,
        s"wide decimal ordering diverged (seed=$seed n=$n)")
    }
  }

  test("wide decimal claimed filters actually push (PushedFilters shows the claim)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val df = (0 until 1000).map(i => (i.toLong, BigDecimal(i.toLong * 1000003L, 4)))
      .toDF("id", "w")
      .select(col("id"), col("w").cast(DecimalType(25, 4)).as("w"))
    val dir = Files.createTempDirectory("cole_widepush").toString
    df.coalesce(1).write.format("cole").mode("overwrite").save(dir)
    val cole = s.read.format("cole").load(dir)
    val q = cole.filter(col("w") < lit(BigDecimal("50.0000")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(w"),
      s"wide decimal comparison was not claimed:\n$plan")
    // claimed completely: no Spark-side Filter node remains above the scan
    assert(!plan.contains("+- Filter "),
      s"expected no residual filter above the scan:\n$plan")
    assert(q.count() === df.filter(col("w") < lit(BigDecimal("50.0000"))).count())
  }

  test("same-column OR is claimed; cross-column OR stays residual") {
    val s = spark
    import s.implicits._
    val df = (0 until 10000).map(i => (i.toLong, s"t-${i % 7}")).toDF("id", "t")
    val dir = Files.createTempDirectory("cole_or_claim").toString
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "1000").save(dir)
    val cole = s.read.format("cole").load(dir)
    val same = cole.filter(col("id") < 1000L || col("id") >= 9000L)
    assert(same.count() === 2000L)
    val ps = same.queryExecution.executedPlan.toString
    assert(!ps.contains("Filter "), s"same-column OR left a residual filter:\n$ps")
    // sorted ids + disjoint row groups: the OR's stat skip plans only the
    // row groups either branch can touch
    val b = new ColeScanBuilder(cole.schema, dir, ColeIO.driverConf())
    b.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.Or(
        org.apache.spark.sql.sources.LessThan("id", 1000L),
        org.apache.spark.sql.sources.GreaterThanOrEqual("id", 9000L))))
    val planned = b.build().asInstanceOf[ColeScan].planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    assert(planned === 2, s"OR stat-skip planned $planned row groups, want 2")
    // cross-column OR: residual Filter present, result exact
    val cross = cole.filter(col("id") < 100L || col("t") === "t-3")
    assert(cross.queryExecution.executedPlan.toString.contains("Filter "))
    assert(cross.count() === df.filter(col("id") < 100L || col("t") === "t-3").count())
  }

  test("cross-column OR prunes row groups skip-only while staying residual") {
    val s = spark
    import s.implicits._
    // both columns ascend together: branch ranges map onto disjoint
    // row-group sets, so stat skipping can prove most groups impossible
    val df = (0 until 10000).map(i => (i.toLong, i.toLong * 10, s"t-${i % 7}"))
      .toDF("a", "b", "t")
    val dir = Files.createTempDirectory("cole_or_skiponly").toString
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "1000").save(dir)
    val cole = s.read.format("cole").load(dir)
    val q = cole.filter(col("a") < 1000L || col("b") >= 90000L)
    assert(q.count() === 2000L)
    val ps = q.queryExecution.executedPlan.toString
    assert(ps.contains("Filter "), "cross-column OR must stay residual")
    assert(ps.contains("SkipOnly"), s"cross-column OR missing from SkipOnly:\n$ps")
    val b = new ColeScanBuilder(cole.schema, dir, ColeIO.driverConf())
    val residual = b.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.Or(
        org.apache.spark.sql.sources.LessThan("a", 1000L),
        org.apache.spark.sql.sources.GreaterThanOrEqual("b", 90000L))))
    assert(residual.length === 1, "cross-column OR must come back as residual")
    val planned = b.build().asInstanceOf[ColeScan].planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    assert(planned === 2, s"skip-only OR planned $planned row groups, want 2")
    // an OR with an unconvertible branch must not skip anything
    val b2 = new ColeScanBuilder(cole.schema, dir, ColeIO.driverConf())
    b2.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.Or(
        org.apache.spark.sql.sources.LessThan("a", 1000L),
        org.apache.spark.sql.sources.AlwaysTrue)))
    val planned2 = b2.build().asInstanceOf[ColeScan].planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    assert(planned2 === 10, s"undecidable OR branch must keep all groups, got $planned2")
  }

  test("IN filters are claimed: no residual Filter above the scan") {
    val s = spark
    import s.implicits._
    val df = (0 until 10000).map(i => (i.toLong, s"t-${i % 7}")).toDF("id", "t")
    val dir = Files.createTempDirectory("cole_in_claim").toString
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "2000").save(dir)
    val cole = s.read.format("cole").load(dir)
    val qn = cole.filter(col("id").isin(5L, 4005L, 99999L))
    assert(qn.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 4005L))
    val pn = qn.queryExecution.executedPlan.toString
    assert(pn.contains("In(id"), s"numeric IN not pushed:\n$pn")
    assert(!pn.contains("Filter "), s"residual filter for numeric IN:\n$pn")
    val qs = cole.filter(col("t").isin("t-1", "t-6", "zzz"))
    assert(qs.count() === df.filter(col("t").isin("t-1", "t-6", "zzz")).count())
    val ps = qs.queryExecution.executedPlan.toString
    assert(ps.contains("In(t"), s"string IN not pushed:\n$ps")
    assert(!ps.contains("Filter "), s"residual filter for string IN:\n$ps")
  }

  test("string equality is claimed and applied on dict and plain encodings") {
    val s = spark
    import s.implicits._
    // unique strings defeat the dictionary probe -> PLAIN chunks exercise
    // the byte-equality fallback; repeated strings -> DICTIONARY id path
    for (unique <- Seq(true, false)) {
      val n = 12000
      val df = (0 until n)
        .map(i => (i.toLong, if (unique) s"u-$i" else s"tag-${i % 5}"))
        .toDF("id", "t")
      val dir = Files.createTempDirectory(s"cole_streq_$unique").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("rowGroupSize", "4096").save(dir)
      val cole = s.read.format("cole").load(dir)
      val target = if (unique) "u-7777" else "tag-3"
      val q = cole.filter(col("t") === target)
      assert(q.collect().map(_.toSeq).toSet ===
        df.filter(col("t") === target).collect().map(_.toSeq).toSet)
      // absent value: zero rows, and on the dict path zero decoded columns
      assert(cole.filter(col("t") === "nope").count() === 0L)
      // the filter is fully claimed: no residual Filter node above the scan
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("EqualTo(t,"), s"filter not pushed in:\n$plan")
      assert(!plan.contains("Filter "), s"residual filter survived in:\n$plan")
      // prefix/suffix/substring/inequality: claimed and row-exact on both
      // encodings (dict path evaluates per dictionary entry)
      for (fc <- Seq(col("t").startsWith("u-1"), col("t").startsWith("tag-"),
          col("t").endsWith("7"), col("t").contains("ag-1"),
          col("t").contains("99"), col("t") =!= "tag-2", col("t") =!= "u-3")) {
        assert(cole.filter(fc).count() === df.filter(fc).count(),
          s"$fc diverged (unique=$unique)")
        val pp = cole.filter(fc).queryExecution.executedPlan.toString
        assert(!pp.contains("Filter "),
          s"residual filter for $fc (unique=$unique):\n$pp")
      }
    }
  }

  test("string MIN/MAX pushes globally and grouped, stays exact") {
    val s = spark
    import s.implicits._
    for (unique <- Seq(true, false)) {
      val n = 9000
      val df = (0 until n)
        .map(i => (i.toLong, if (unique) f"u-$i%05d" else s"tag-${i % 7}", i % 100))
        .toDF("id", "t", "m")
      val dir = Files.createTempDirectory(s"cole_strmm_$unique").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("rowGroupSize", "2048").save(dir)
      val cole = s.read.format("cole").load(dir)
      // unfiltered global: answered from dictionary entries / value sweep
      val q = cole.agg(min("t").as("mn"), max("t").as("mx"), count(lit(1)).as("c"))
      assert(q.head() === df.agg(min("t"), max("t"), count(lit(1))).head())
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("MIN(t)") && plan.contains("PushedAggregates"),
        s"string min/max not pushed (unique=$unique):\n$plan")
      // filtered global: selection sweep, including an all-rows-filtered case
      val f = cole.filter(col("m") < 37).agg(min("t"), max("t"))
      assert(f.head() === df.filter(col("m") < 37).agg(min("t"), max("t")).head())
      val empty = cole.filter(col("m") < 0).agg(min("t"), max("t")).head()
      assert(empty.isNullAt(0) && empty.isNullAt(1))
      // grouped string min/max: pushes via byte-array accumulator slots
      val g = cole.groupBy("m").agg(min("t").as("mn"), max("t").as("mx"))
      assert(g.queryExecution.executedPlan.toString.contains("PushedAggregates"),
        s"grouped string min/max should push (unique=$unique)")
      assert(g.collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap ===
        df.groupBy("m").agg(min("t").as("mn"), max("t").as("mx"))
          .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2)))).toMap)
      // mixed numeric + string aggregates in one grouped pushdown
      val mix = cole.groupBy("m").agg(sum("id").as("s"), min("t").as("mn"),
        count(lit(1)).as("c"))
      assert(mix.collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap ===
        df.groupBy("m").agg(sum("id").as("s"), min("t").as("mn"), count(lit(1)).as("c"))
          .collect().map(r => r.getInt(0) ->
            ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap,
        s"mixed grouped agg diverged (unique=$unique)")
    }
  }

  test("grouped pushdown past the 64k-group flush boundary stays exact") {
    val s = spark
    import s.implicits._
    // 150k distinct keys in one partition: the grouped reader must flush
    // its hash mid-stream (>65536 groups) and Spark must merge the
    // multiple partial rows per key correctly
    val n = 150000
    val df = (0 until n).map(i => (i.toLong % 100000L, i.toLong)).toDF("k", "v")
    val dir = Files.createTempDirectory("cole_flush").toString
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "32768").save(dir)
    val got = spark.read.format("cole").load(dir)
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = (0 until n).map(i => (i.toLong % 100000L, i.toLong))
      .groupBy(_._1).map { case (k, vs) => k -> ((vs.map(_._2).sum, vs.size.toLong)) }
    assert(got === want)
  }

  test("one oversized row group of unique keys flushes mid-group, stays exact") {
    val s = spark
    import s.implicits._
    // 150k unique keys in a SINGLE row group (rowGroupSize > n): the
    // grouped reader must flush between slices inside the row group —
    // previously the flush check only ran between row groups, so a large
    // writer-set rowGroupSize grew the hash unboundedly
    val n = 150000
    val df = (0 until n).map(i => (i.toLong, i.toLong * 3)).toDF("k", "v")
    val dir = Files.createTempDirectory("cole_bigrg").toString
    df.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "200000").save(dir)
    val got = spark.read.format("cole").load(dir)
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === n)
    assert((0 until n).forall(i => got(i.toLong) == ((i.toLong * 3, 1L))))
  }

  test("pushed TopN == full sort-take across seeded datasets and shapes") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(3, 11); sorted <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed)
      val n = 20000
      val base = (0 until n).map(i => (i.toLong, rnd.nextLong() % 100000L))
      val rows = if (sorted) base else rnd.shuffle(base)
      val df = rows.toDF("id", "v")
      val dir = Files.createTempDirectory(s"cole_topn_${seed}_$sorted").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("rowGroupSize", "4096").save(dir)
      val cole = s.read.format("cole").load(dir)
      for (k <- Seq(1, 17, 4096, 4097); desc <- Seq(true, false)) {
        // two-column sort: prunes on the leading key, ties exact via id
        val got = (if (desc) cole.orderBy(col("v").desc, col("id"))
          else cole.orderBy(col("v").asc, col("id")))
          .limit(k).select("v", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
        val ord = if (desc) Ordering.Tuple2(Ordering[Long].reverse, Ordering[Long])
          else Ordering.Tuple2(Ordering[Long], Ordering[Long])
        val want = rows.map { case (id, v) => (v, id) }.sorted(ord).take(k)
        assert(got.toSeq === want,
          s"TopN diverged (seed=$seed sorted=$sorted k=$k desc=$desc)")
        // single-column sort; ties make row identity ambiguous, so
        // compare the value multiset
        val gotV = (if (desc) cole.orderBy(col("v").desc) else cole.orderBy(col("v").asc))
          .limit(k).select("v").collect().map(_.getLong(0)).toSeq
        val wantV = {
          val vs = rows.map(_._2).sorted
          if (desc) vs.reverse.take(k) else vs.take(k)
        }
        assert(gotV === wantV,
          s"pushed TopN diverged (seed=$seed sorted=$sorted k=$k desc=$desc)")
      }
    }
  }

  test("filtered TopN == filter + sort-take across seeded datasets") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(5, 19); sorted <- Seq(true, false)) {
      val rnd = new scala.util.Random(seed)
      val n = 20000
      val base = (0 until n).map(i => (i.toLong, rnd.nextLong() % 100000L))
      val rows = if (sorted) base else rnd.shuffle(base)
      val df = rows.toDF("id", "v")
      val dir = Files.createTempDirectory(s"cole_ftopn_${seed}_$sorted").toString
      df.coalesce(1).write.format("cole").mode("overwrite")
        .option("rowGroupSize", "4096").save(dir)
      val cole = s.read.format("cole").load(dir)
      // filters on the sort key itself, on the other column, and a range
      // straddling row-group stat boundaries
      val filters: Seq[(org.apache.spark.sql.Column, (Long, Long) => Boolean)] = Seq(
        (col("v") > 0L, (id, v) => v > 0L),
        (col("id") >= 5000L && col("id") < 15000L, (id, v) => id >= 5000L && id < 15000L),
        (col("v") >= -50000L && col("v") <= 50000L, (id, v) => v >= -50000L && v <= 50000L))
      for (((fc, fp), fi) <- filters.zipWithIndex; k <- Seq(1, 17, 4097); desc <- Seq(true, false)) {
        val got = (if (desc) cole.filter(fc).orderBy(col("v").desc, col("id"))
          else cole.filter(fc).orderBy(col("v").asc, col("id")))
          .limit(k).select("v", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
        val ord = if (desc) Ordering.Tuple2(Ordering[Long].reverse, Ordering[Long])
          else Ordering.Tuple2(Ordering[Long], Ordering[Long])
        val want = rows.filter { case (id, v) => fp(id, v) }
          .map { case (id, v) => (v, id) }.sorted(ord).take(k)
        assert(got.toSeq === want,
          s"filtered TopN diverged (seed=$seed sorted=$sorted f=$fi k=$k desc=$desc)")
      }
    }
    // plan shows BOTH the applied filter and the pushed TopN
    val dir = Files.createTempDirectory("cole_ftopn_plan").toString
    (0L until 10000L).map(i => (i, i * 3 % 1000)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "1000").save(dir)
    val plan = s.read.format("cole").load(dir)
      .filter(col("id") >= 2000L).orderBy(col("id")).limit(5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedTopN"), s"missing PushedTopN in:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(id,2000)"),
      s"missing pushed filter in:\n$plan")
  }

  test("filtered TopN prunes row groups when the filter provably keeps them") {
    val s = spark
    import s.implicits._
    // sorted ids: every row group has tight disjoint id stats, so a range
    // filter fully keeps interior groups and the TopN threshold can count
    // their rows -> far fewer row groups planned than the filter alone
    val dir = Files.createTempDirectory("cole_ftopn_prune").toString
    (0L until 32000L).toDF("id").coalesce(1).sortWithinPartitions("id")
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "1000").save(dir)
    val schema = s.read.format("cole").load(dir).schema
    val b = new ColeScanBuilder(schema, dir, ColeIO.driverConf())
    b.pushFilters(Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 4000L)))
    import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, NullOrdering}
    b.pushTopN(Array(Expressions.sort(Expressions.column("id"),
      SortDirection.ASCENDING, NullOrdering.NULLS_FIRST)), 10)
    val planned = b.build().asInstanceOf[ColeScan].planInputPartitions()
      .map(_.asInstanceOf[ColeInputPartition].rowGroups.length).sum
    // filter alone keeps 28 of 32 groups; ASC TopN(10) needs only the
    // first surviving group (ids 4000-4999)
    assert(planned === 1, s"expected 1 row group planned, got $planned")
  }
}
