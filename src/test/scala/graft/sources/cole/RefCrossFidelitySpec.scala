package graft.sources.cole

import java.io.File

import scala.sys.process._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side cross-fidelity: the REFERENCE engine's own binary
  * (compiled from /root/reference/columnar-analytics-engine, reader:
  * src/format.cpp, CLI grammar: src/cli.cpp:226-268) must scan and query
  * graft-WRITTEN `.col` files with results identical to graft's own math
  * over the same file. The checked-in `ref_fixture.col` proves the read
  * direction (ColeSourceSpec); this proves the write direction, closing
  * the exchange loop a reference user would hit first.
  *
  * Tests cancel (not fail) when g++ or the reference sources are absent,
  * so the suite stays green on boxes without the reference checkout.
  */
class RefCrossFidelitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val refRoot = "/root/reference/columnar-analytics-engine"
  private val binPath = "/tmp/graft_refcli/cae"

  /** Compile the reference CLI once per box (cached binary). */
  private lazy val refBin: Option[String] = {
    val bin = new File(binPath)
    if (bin.exists()) Some(binPath)
    else if (!new File(s"$refRoot/src/cli.cpp").exists()) None
    else {
      bin.getParentFile.mkdirs()
      val cmd = Seq("g++", "-std=c++20", "-O2", s"-I$refRoot/include",
        s"$refRoot/src/cli.cpp", s"$refRoot/src/encoding.cpp",
        s"$refRoot/src/execution.cpp", s"$refRoot/src/format.cpp",
        "-o", binPath)
      if (cmd.! == 0) Some(binPath) else None
    }
  }

  private def ref(args: String*): String = {
    val out = new StringBuilder
    Process(refBin.get +: args).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    out.toString
  }

  private def firstLong(out: String, field: String): Long = {
    val rx = (java.util.regex.Pattern.quote(field) + raw"\s*[:=]?\s*(-?\d+)").r
    rx.findFirstMatchIn(out).map(_.group(1).toLong)
      .getOrElse(fail(s"'$field' not found in reference output:\n$out"))
  }

  /** One single-part graft-written file, several row groups, adaptive
    * encodings (sorted id -> DELTA, low-card strings -> DICT).
    */
  private lazy val graftFile: String = {
    val dir = "/tmp/graft_xfid_spec/cli_shaped"
    val part = {
      val existing = Option(new File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".col"))
      if (existing.nonEmpty) existing.head
      else {
        val regions = array(lit("north"), lit("south"), lit("east"), lit("west"))
        val statuses = array(lit("active"), lit("pending"), lit("closed"))
        def h(salt: Int) = abs(xxhash64(col("id"), lit(7), lit(salt)))
        spark.range(20000).coalesce(1)
          .select(col("id"),
            (h(1) % 10001).as("value"),
            (h(2) % 5 + 1).cast("int").as("category"),
            element_at(regions, (h(3) % 4 + 1).cast("int")).as("region"),
            element_at(statuses, (h(4) % 3 + 1).cast("int")).as("status"))
          .write.format("cole").mode("overwrite")
          .option("rowGroupSize", "4096").save(dir)
        new File(dir).listFiles().filter(_.getName.endsWith(".col")).head
      }
    }
    part.getAbsolutePath
  }

  test("reference `scan` reads a graft-written file: rows, row groups, schema") {
    assume(refBin.isDefined, "reference engine sources/g++ unavailable")
    val out = ref("scan", graftFile)
    val df = spark.read.format("cole").load(graftFile)
    assert(firstLong(out, "Total rows") == df.count())
    assert(firstLong(out, "Row groups") == 5, s"expected ceil(20000/4096) groups:\n$out")
    for ((name, tpe) <- Seq("id" -> "INT64", "value" -> "INT64",
        "category" -> "INT32", "region" -> "STRING", "status" -> "STRING"))
      assert(out.contains(s"- $name (type=$tpe"), s"schema line for $name:\n$out")
  }

  test("reference `query --agg` over a graft-written file matches graft's math") {
    assume(refBin.isDefined, "reference engine sources/g++ unavailable")
    val out = ref("query", graftFile, "--agg", "sum", "value")
    val exp = spark.read.format("cole").load(graftFile)
      .agg(count(lit(1)), sum("value"), min("value"), max("value")).head()
    assert(firstLong(out, "count") == exp.getLong(0))
    assert(firstLong(out, "sum") == exp.getLong(1))
    assert(firstLong(out, "min") == exp.getLong(2))
    assert(firstLong(out, "max") == exp.getLong(3))
  }

  test("reference `query --where --agg` (stats-skippable filter) matches") {
    assume(refBin.isDefined, "reference engine sources/g++ unavailable")
    val out = ref("query", graftFile, "--where", "value", "gt", "5000",
      "--agg", "sum", "value")
    val exp = spark.read.format("cole").load(graftFile)
      .filter(col("value") > 5000).agg(count(lit(1)), sum("value")).head()
    assert(firstLong(out, "count") == exp.getLong(0))
    assert(firstLong(out, "sum") == exp.getLong(1))
  }

  test("reference `query --groupby` on a graft dict-encoded string column matches") {
    assume(refBin.isDefined, "reference engine sources/g++ unavailable")
    val out = ref("query", graftFile, "--groupby", "region", "--agg", "sum", "value")
    val groups = raw"\s+(\w+): count=(\d+), sum=(-?\d+)".r
      .findAllMatchIn(out)
      .map(m => m.group(1) -> ((m.group(2).toLong, m.group(3).toLong))).toMap
    val exp = spark.read.format("cole").load(graftFile)
      .groupBy("region").agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(groups == exp, s"reference groupby diverged:\n$out")
  }

  test("reference `query --select --where` row count matches") {
    assume(refBin.isDefined, "reference engine sources/g++ unavailable")
    val out = ref("query", graftFile, "--where", "category", "le", "2",
      "--select", "id,category")
    val exp = spark.read.format("cole").load(graftFile)
      .filter(col("category") <= 2).count()
    assert(firstLong(out, "Query returned") == exp)
  }

  test("reference reads every explicit graft encoding: PLAIN/RLE/DELTA/DICT") {
    assume(refBin.isDefined, "reference engine sources/g++ unavailable")
    import graft.sources.cole.ColeFormat._
    val file = "/tmp/graft_xfid_spec/encodings.col"
    new File(file).getParentFile.mkdirs()
    val n = 5000
    val cols = Seq(
      ColeColumn("rle_k", TInt64, Rle),
      ColeColumn("delta_v", TInt32, Delta),
      ColeColumn("plain_w", TInt64, Plain),
      ColeColumn("dict_s", TString, Dict),
      ColeColumn("plain_t", TString, Plain))
    val rleK = Array.tabulate(n)(i => (i / 500).toLong)     // long runs
    val deltaV = Array.tabulate(n)(i => i * 3 + 1)          // sorted
    val plainW = Array.tabulate(n)(i => (i * 2654435761L) % 100003 - 50000)
    val dictS = Array.tabulate(n)(i => s"g${i % 7}".getBytes("UTF-8"))
    val plainT = Array.tabulate(n)(i => s"row-$i".getBytes("UTF-8"))
    val w = new ColeFileWriter(file, cols)
    try {
      // two row groups to cross a group boundary under every encoding
      for (half <- 0 to 1) {
        val (from, until) = (half * n / 2, (half + 1) * n / 2)
        w.writeRowGroup(Seq(
          ColumnData(null, rleK.slice(from, until), null),
          ColumnData(deltaV.slice(from, until), null, null),
          ColumnData(null, plainW.slice(from, until), null),
          ColumnData(null, null, dictS.slice(from, until)),
          ColumnData(null, null, plainT.slice(from, until))),
          until - from)
      }
    } finally w.close()

    assert(firstLong(ref("scan", file), "Total rows") == n)
    for (c <- Seq("rle_k", "delta_v", "plain_w")) {
      val out = ref("query", file, "--agg", "sum", c)
      val exp = spark.read.format("cole").load(file)
        .agg(sum(col(c).cast("long")), min(col(c).cast("long")),
          max(col(c).cast("long"))).head()
      assert(firstLong(out, "sum") == exp.getLong(0), s"$c sum:\n$out")
      assert(firstLong(out, "min") == exp.getLong(1), s"$c min:\n$out")
      assert(firstLong(out, "max") == exp.getLong(2), s"$c max:\n$out")
    }
    val out = ref("query", file, "--groupby", "dict_s", "--agg", "sum", "rle_k")
    val groups = raw"\s+(\S+): count=(\d+), sum=(-?\d+)".r
      .findAllMatchIn(out)
      .map(m => m.group(1) -> ((m.group(2).toLong, m.group(3).toLong))).toMap
    val exp = spark.read.format("cole").load(file)
      .groupBy("dict_s").agg(count(lit(1)).as("n"), sum("rle_k").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(groups == exp, s"groupby over dict column diverged:\n$out")
  }

  test("graft `write` to a .col file reproduces the reference CLI's value stream") {
    assume(refBin.isDefined, "reference engine sources/g++ unavailable")
    val dir = "/tmp/graft_xfid_spec/stream"
    new File(dir).mkdirs()
    val refFile = s"$dir/ref_write.col"
    val graftFile = s"$dir/graft_write.col"
    if (!new File(refFile).exists()) ref("write", refFile, "5000", "7")
    graft.Cli.writeRefStream(graftFile, 5000L, seed = 7L)
    val a = spark.read.format("cole").load(refFile).orderBy("id").collect()
    val b = spark.read.format("cole").load(graftFile).orderBy("id").collect()
    assert(a.length === 5000 && b.length === 5000)
    assert(a.toSeq === b.toSeq,
      "same seed must produce identical rows across engines")
    // and the reference binary agrees with itself over the graft file
    val refAgg = ref("query", graftFile, "--agg", "sum", "value")
    val exp = spark.read.format("cole").load(refFile)
      .agg(sum("value"), min("value"), max("value")).head()
    assert(firstLong(refAgg, "sum") === exp.getLong(0))
    assert(firstLong(refAgg, "min") === exp.getLong(1))
    assert(firstLong(refAgg, "max") === exp.getLong(2))
  }
}
