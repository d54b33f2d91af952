package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Bloom sidecar: string point lookups skip row groups at planning time,
  * results stay exact, stale or absent sidecars are ignored.
  */
class ColeBloomIndexSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private def conf = ColeIO.driverConf()

  /** High-cardinality string key → PLAIN encoding, no dictionary, no
    * stats: exactly the shape only the sidecar can prune.
    */
  private def writeTable(dir: String): Unit =
    Tables.lineitem(spark, sfDir)
      .select(concat(lit("ok_"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("line_id"),
        col("l_orderkey"), col("l_partkey"))
      .orderBy("l_orderkey", "l_partkey")
      .coalesce(1)
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(dir)

  private def probe(dir: String, orderkey: Int): String =
    spark.read.format("cole").load(dir)
      .filter(col("l_orderkey") === orderkey)
      .select("line_id").head().getString(0)

  test("point lookup skips most row groups, values exact") {
    val dir = Files.createTempDirectory("cole_bloomidx").toString
    writeTable(dir)
    val key = probe(dir, 700)
    val expected = spark.read.format("cole").load(dir)
      .filter(col("line_id") === key).collect().toSeq
    assert(expected.nonEmpty, "probe key must exist in the fixture")

    val indexed = ColeBloomIndex.build(dir, Seq("line_id"), conf)
    assert(indexed === 1)
    ColeBloomIndex.skippedRowGroups.set(0)
    val got = spark.read.format("cole").load(dir)
      .filter(col("line_id") === key).collect().toSeq
    assert(got === expected)
    // ~12 row groups of 512 over 6000 rows; the probe value lives in one,
    // so the index must prove most of the rest away
    assert(ColeBloomIndex.skippedRowGroups.get() >= 8,
      s"only ${ColeBloomIndex.skippedRowGroups.get()} row groups skipped")

    // IN probes skip only when EVERY value is absent
    ColeBloomIndex.skippedRowGroups.set(0)
    val key2 = probe(dir, 5)
    val in = spark.read.format("cole").load(dir)
      .filter(col("line_id").isin(key, key2)).collect()
    assert(in.map(_.getString(0)).toSet === Set(key, key2))
    assert(ColeBloomIndex.skippedRowGroups.get() > 0)
  }

  test("missing value: every row group skipped, zero rows, no error") {
    val dir = Files.createTempDirectory("cole_bloomidx_miss").toString
    writeTable(dir)
    ColeBloomIndex.build(dir, Seq("line_id"), conf)
    ColeBloomIndex.skippedRowGroups.set(0)
    val got = spark.read.format("cole").load(dir)
      .filter(col("line_id") === "no_such_key").count()
    assert(got === 0L)
    assert(ColeBloomIndex.skippedRowGroups.get() >= 11)
  }

  test("stale sidecar (rewritten data file) is ignored, not trusted") {
    val dir = Files.createTempDirectory("cole_bloomidx_stale").toString
    writeTable(dir)
    ColeBloomIndex.build(dir, Seq("line_id"), conf)
    // rewrite the table differently: sizes change, sidecar goes stale
    Tables.lineitem(spark, sfDir)
      .select(concat(lit("nk_"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("line_id"),
        col("l_orderkey"), col("l_partkey"))
      .coalesce(1)
      .write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(dir)
    // the old sidecar would claim "nk_*" absent everywhere; it must be
    // ignored because the data file's length no longer matches
    val key = probe(dir, 700) // an "nk_..." id present in the new data
    assert(key.startsWith("nk_"))
    val got = spark.read.format("cole").load(dir)
      .filter(col("line_id") === key).collect()
    assert(got.nonEmpty, "stale sidecar caused a wrong empty result")
  }

  test("same-length same-mtime rewrite: content fingerprint distrusts the sidecar") {
    val dir = Files.createTempDirectory("cole_bloomidx_fp").toString
    writeTable(dir)
    ColeBloomIndex.build(dir, Seq("line_id"), conf)
    val (fs, _) = ColeIO.resolve(dir, conf)
    val st = ColeIO.listStatus(dir, conf).head
    val file = st.getPath
    val (len, mtime) = (st.getLen, st.getModificationTime)
    val pred = Array(ColePredicate("line_id", "eqs", 0L,
      strValue = "no_such_key".getBytes))
    assert(ColeBloomIndex.skips(file.toString, len, mtime, 0, pred, conf),
      "fresh sidecar must prove the absent key away")

    // rewrite ONE byte in the footer region — length unchanged — then
    // restore the original mtime, simulating a same-length rewrite inside
    // one mtime tick on a coarse-granularity filesystem
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(file)
    try in.readFully(0, bytes, 0, bytes.length) finally in.close()
    bytes(bytes.length - 9) = (bytes(bytes.length - 9) ^ 0x7f).toByte
    val out = fs.create(file, true)
    try out.write(bytes) finally out.close()
    fs.setTimes(file, mtime, -1)
    val st2 = fs.getFileStatus(file)
    assert(st2.getLen == len && st2.getModificationTime == mtime,
      "fixture must present identical stat metadata")

    // (len, mtime) still match, so only the load-time fingerprint can
    // catch it (a cold cache — fresh driver — is the scenario)
    ColeBloomIndex.invalidate(file.toString, len, mtime)
    assert(!ColeBloomIndex.skips(file.toString, len, mtime, 0, pred, conf),
      "stale sidecar trusted after a same-stat rewrite — wrong empty results")
  }

  test("unindexed tables and non-string predicates are untouched") {
    val dir = Files.createTempDirectory("cole_bloomidx_none").toString
    writeTable(dir)
    // no index built: full behavior, exact values
    val got = spark.read.format("cole").load(dir)
      .filter(col("line_id") === probe(dir, 700) && col("l_orderkey") >= 0)
      .collect()
    assert(got.nonEmpty)
  }
}
