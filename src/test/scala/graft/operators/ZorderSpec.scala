package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables
import graft.sources.cole.ColeMeta

/** Z-order clustering: the Morton code must be the real bit interleave,
  * and the clustered layout must prune row groups for a 2-D predicate
  * that a single-column sort cannot.
  */
class ZorderSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  test("zvalue is the bit interleave (a even positions, b odd)") {
    val s = spark
    import s.implicits._
    def morton(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= (a >> i & 1L) << (2 * i)
        z |= (b >> i & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (199L, 9L),
      (0xFFFFFFFFL, 0L), (123456789L, 987654321L))
    val got = cases.toDF("a", "b")
      .select(Zorder.zvalue(col("a"), col("b")).as("z")).as[Long].collect()
    cases.zip(got).foreach { case ((a, b), z) =>
      assert(z == morton(a, b), s"zvalue($a, $b)")
    }
  }

  test("cluster order is unsigned: keys past bit 31 extend the curve, not wrap it") {
    val s = spark
    import s.implicits._
    // b = 2^31 makes the raw Morton code negative; the cluster sort key
    // must still place it AFTER every b < 2^31 row for equal a
    val df = Seq((1L, (1L << 31) - 1L), (1L, 1L << 31), (0L, 0L))
      .toDF("a", "b")
    val got = Zorder.cluster(df, col("a"), col("b"), numPartitions = 1)
      .select("b").as[Long].collect()
    assert(got.toSeq === Seq(0L, (1L << 31) - 1L, 1L << 31),
      s"unsigned z order violated: ${got.toSeq}")
  }

  test("sortableDoubleBits: signed-long order equals double order") {
    import graft.functions.BitsRuntime.sortableDoubleBits
    val rnd = new scala.util.Random(7)
    val specials = Seq(Double.NegativeInfinity, -Double.MaxValue, -1.5e300,
      -1.0, -Double.MinPositiveValue, -0.0, 0.0, Double.MinPositiveValue,
      1.0, 1.5e300, Double.MaxValue, Double.PositiveInfinity)
    val doubles = (specials ++ Seq.fill(10000)(
      rnd.nextDouble() * math.pow(10, rnd.nextInt(600) - 300) *
        (if (rnd.nextBoolean()) -1 else 1))).sorted
    doubles.sliding(2).foreach { case Seq(a, b) =>
      val (ka, kb) = (sortableDoubleBits(a), sortableDoubleBits(b))
      // strictly monotone; == refines to IEEE total order (-0.0 < +0.0,
      // same as java.lang.Double.compare), which clustering is free to use
      assert(if (a < b) ka < kb else ka <= kb,
        s"order broken: $a -> $ka vs $b -> $kb")
    }
    // -0.0 and +0.0 compare equal as doubles but both must stay below
    // every positive and above every negative
    assert(sortableDoubleBits(-0.0) < sortableDoubleBits(Double.MinPositiveValue))
    assert(sortableDoubleBits(0.0) > sortableDoubleBits(-Double.MinPositiveValue))
    assert(sortableDoubleBits(Double.NaN) > sortableDoubleBits(Double.PositiveInfinity))
  }

  test("doubleKey z-order prunes a 2-D (double, int) predicate rank-free") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val base = "/tmp/graft_zorder_dbl_spec"
    val linDir = s"$base/linear"
    val zDir = s"$base/zorder"
    li.repartitionByRange(2, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(linDir)
    Zorder.cluster(li, Zorder.doubleKey(col("l_extendedprice")), col("l_partkey"),
        numPartitions = 2)
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(zDir)

    // row groups a (l_extendedprice < 5000 AND l_partkey < 100) scan must
    // read, from the footers' double + int stats
    def overlapping(dir: String): (Long, Long) = {
      val rg = ColeMeta.describe(spark, dir)
        .filter(col("column").isin("l_extendedprice", "l_partkey"))
        .groupBy("file", "row_group")
        .agg(
          min(when(col("column") === "l_extendedprice", col("min_double"))).as("price_mn"),
          min(when(col("column") === "l_partkey", col("min_int"))).as("pk_mn"))
      val total = rg.count()
      val hit = rg.filter(col("price_mn") < 5000.0 && col("pk_mn") < 100).count()
      (hit, total)
    }
    val (linHit, linTotal) = overlapping(linDir)
    val (zHit, zTotal) = overlapping(zDir)
    assert(linTotal >= 10 && zTotal >= 10, s"want >=10 row groups, got $linTotal/$zTotal")
    assert(zHit * 2 <= linHit,
      s"double z-order must at least halve surviving groups: z $zHit/$zTotal vs linear $linHit/$linTotal")

    // identical data back through the double-range scan on both layouts
    val pred = col("l_extendedprice") < 5000.0 && col("l_partkey") < 100
    val a = spark.read.format("cole").load(linDir).filter(pred)
    val b = spark.read.format("cole").load(zDir).filter(pred)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("z-order layout prunes 2-D predicates a linear sort cannot") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val base = "/tmp/graft_zorder_spec"
    val linDir = s"$base/linear"
    val zDir = s"$base/zorder"
    li.repartitionByRange(2, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(linDir)
    Zorder.cluster(li, col("l_partkey"), col("l_suppkey"), numPartitions = 2)
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(zDir)

    // per-row-group [min,max] of both keys from the footer stats; count
    // groups a scan with (l_partkey < 50 AND l_suppkey < 3) must read
    def overlapping(dir: String): (Long, Long) = {
      val rg = ColeMeta.describe(spark, dir)
        .filter(col("column").isin("l_partkey", "l_suppkey"))
        .groupBy("file", "row_group")
        .pivot("column", Seq("l_partkey", "l_suppkey"))
        .agg(min("min_int").as("mn"), max("max_int").as("mx"))
      val total = rg.count()
      val hit = rg.filter(col("l_partkey_mn") < 50 && col("l_suppkey_mn") < 3)
        .count()
      (hit, total)
    }
    val (linHit, linTotal) = overlapping(linDir)
    val (zHit, zTotal) = overlapping(zDir)
    assert(linTotal >= 10 && zTotal >= 10, s"want >=10 row groups, got $linTotal/$zTotal")
    // the linear layout scatters (partkey, suppkey) uniformly: essentially
    // every group overlaps the rectangle; z-order confines it
    assert(zHit * 2 <= linHit,
      s"z-order must at least halve surviving groups: z $zHit/$zTotal vs linear $linHit/$linTotal")

    // and the data read back is identical
    val a = spark.read.format("cole").load(linDir)
      .filter(col("l_partkey") < 50 && col("l_suppkey") < 3)
    val b = spark.read.format("cole").load(zDir)
      .filter(col("l_partkey") < 50 && col("l_suppkey") < 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
