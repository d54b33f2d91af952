package graft.sources.cole

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** Opt-in page compression: identical values through every read path
  * (scan, filter, aggregate pushdown, dictionary strings), genuinely
  * smaller files, stored-layout defaults untouched, incompressible pages
  * falling back to stored.
  */
class ColeCompressSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  /** One fixture shape for every test in this suite — the -z fallback
    * must exercise the same columns/sort/encodings as the in-suite run.
    */
  private def writeDeflateFixture(d: String): Unit =
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
      .orderBy("l_orderkey", "l_linenumber")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "2048").option("compress", "deflate").save(d)

  private def dirSize(d: String): Long =
    Files.walk(Paths.get(d)).filter(Files.isRegularFile(_))
      .mapToLong(Files.size(_)).sum()

  test("deflate round-trip equals stored across all read paths") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus")
    val plain = "/tmp/graft_compress_spec/plain"
    val defl = "/tmp/graft_compress_spec/deflate"
    // sorted write → DELTA on the sort key, RLE-ish runs, DICT strings:
    // compression composes with every encoding the writer picks
    li.orderBy("l_orderkey", "l_linenumber")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "2048").save(plain)
    writeDeflateFixture(defl)

    val szPlain = dirSize(plain)
    val szDefl = dirSize(defl)
    assert(szDefl < szPlain,
      s"deflate must shrink the table: $szDefl !< $szPlain")

    val a = spark.read.format("cole").load(plain)
    val b = spark.read.format("cole").load(defl)
    // full scan parity
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // filtered scan (selection vectors over inflated pages)
    val fa = a.filter(col("l_partkey") < 50 && col("l_returnflag") === "A").count()
    val fb = b.filter(col("l_partkey") < 50 && col("l_returnflag") === "A").count()
    assert(fa === fb && fb > 0)
    // aggregate pushdown (page sweeps read inflated bodies)
    val ga = a.groupBy("l_returnflag").agg(sum("l_orderkey"), min("l_partkey"),
      max("l_suppkey"), count(lit(1))).orderBy("l_returnflag").collect()
    val gb = b.groupBy("l_returnflag").agg(sum("l_orderkey"), min("l_partkey"),
      max("l_suppkey"), count(lit(1))).orderBy("l_returnflag").collect()
    assert(ga.toSeq === gb.toSeq)
  }

  test("default writes stay stored: every page has sizes equal") {
    val d = "/tmp/graft_compress_spec/stored_check"
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_returnflag")
      .coalesce(1).write.format("cole").mode("overwrite").save(d)
    val pages = ColeMeta.describe(spark, d)
    assert(pages.count() > 0)
    // ColeMeta surfaces uncompressed_size; stored layout means on-disk
    // chunk bytes == header bytes + uncompressed bodies. Verify at the
    // footer level: no page of a default write may have differing sizes.
    ColeUtil.listFiles(d).foreach { f =>
      val r = new ColeFileReader(f)
      try r.meta.rowGroups.foreach(_.chunks.foreach(_.pages.foreach(ph =>
        assert(ph.compressedSize == ph.uncompressedSize, s"compressed page in default write: $f"))))
      finally r.close()
    }
  }

  test("compressed table carries differing sizes; incompressible bodies fall back") {
    val d = "/tmp/graft_compress_spec/deflate"
    if (!new java.io.File(d).exists()) // self-sufficient under -z filtering
      writeDeflateFixture(d)
    var compressed = 0
    ColeUtil.listFiles(d).foreach { f =>
      val r = new ColeFileReader(f)
      try r.meta.rowGroups.foreach(_.chunks.foreach(_.pages.foreach { ph =>
        assert(ph.compressedSize <= ph.uncompressedSize)
        if (ph.compressedSize < ph.uncompressedSize) compressed += 1
      }))
      finally r.close()
    }
    assert(compressed > 0, "expected at least one deflated page")
    // codec level: random bytes don't compress → returned as-is (stored)
    val rnd = new scala.util.Random(7)
    val raw = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    assert(ColeCodec.deflate(raw) eq raw)
    // and a compressible body round-trips bit-exactly
    val runs = Array.tabulate[Byte](4096)(i => (i / 128).toByte)
    val packed = ColeCodec.deflate(runs)
    assert(packed.length < runs.length)
    assert(ColeCodec.inflate(packed, 0, packed.length, runs.length).toSeq == runs.toSeq)
  }

  test("corrupt or truncated compressed pages fail loudly, not silently") {
    val runs = Array.tabulate[Byte](4096)(i => (i / 128).toByte)
    val packed = ColeCodec.deflate(runs)
    // truncation: fewer input bytes than the stream needs
    intercept[ColeFormat.ColeFormatException] {
      ColeCodec.inflate(packed, 0, packed.length / 2, runs.length)
    }
    // size lie downward: the stream decodes MORE than the declared size
    intercept[ColeFormat.ColeFormatException] {
      ColeCodec.inflate(packed, 0, packed.length, runs.length - 1)
    }
    // length mismatch: the stream ends before producing the page's
    // declared uncompressed size. (Raw DEFLATE carries no checksum —
    // same integrity posture as the reference format, which has none —
    // so arbitrary bit flips are the storage layer's problem; what the
    // reader guarantees is that size lies never pass silently.)
    intercept[ColeFormat.ColeFormatException] {
      ColeCodec.inflate(packed, 0, packed.length, runs.length + 1)
    }
  }
}
