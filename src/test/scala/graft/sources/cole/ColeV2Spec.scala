package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.Tables

/** COLE format v2: DOUBLE + TIMESTAMP columns and per-page null bitmaps.
  *
  * The fidelity contract: v1 stays the DEFAULT and byte-compatible with
  * the reference layout (RefCrossFidelitySpec proves that separately);
  * v2 is chosen automatically only when the schema demands it
  * (double/timestamp columns) or explicitly via formatVersion=2 (nullable
  * data of v1-representable types).
  */
class ColeV2Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def headerVersion(dir: String): Int = {
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".col")).head
    val in = new java.io.FileInputStream(f)
    val b = new Array[Byte](6)
    try { in.read(b) } finally in.close()
    (b(4) & 0xff) | ((b(5) & 0xff) << 8)
  }

  test("full lineitem (doubles + timestamp) round-trips through auto-v2") {
    val dir = Files.createTempDirectory("cole_v2_lineitem").toString
    val src = Tables.lineitem(spark, sfDir)
    src.coalesce(2).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "2048").save(dir)
    assert(headerVersion(dir) === 2, "double/timestamp schema must select v2")
    val back = spark.read.format("cole").load(dir)
    assert(back.schema("l_extendedprice").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(back.schema("l_shipdate").dataType ===
      org.apache.spark.sql.types.TimestampNTZType) // parquet isAdjustedToUTC=false
    // exact value fidelity, all 11 columns, both directions
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
  }

  test("defaults stay v1 for int/long/string schemas") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_default").toString
    (0 until 1000).map(i => (i.toLong, s"s$i")).toDF("x", "y")
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    assert(headerVersion(dir) === 1, "v1 must remain the default")
  }

  test("nulls round-trip under formatVersion=2 across all types") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_nulls").toString
    val src = (0 until 5000).map { i =>
      (i.toLong,
        if (i % 7 == 0) None else Some(i * 1.5),
        if (i % 11 == 0) None else Some(s"doc_$i"),
        if (i % 13 == 0) None else Some(i.toLong * 3))
    }.toDF("id", "score", "name", "cnt")
    src.coalesce(1).write.format("cole").mode("overwrite")
      .option("formatVersion", "2").option("rowGroupSize", "512").save(dir)
    val back = spark.read.format("cole").load(dir)
    // inferred schema marks null-bearing columns nullable
    assert(back.schema("score").nullable && back.schema("name").nullable &&
      back.schema("cnt").nullable)
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
    // null semantics through filters and aggregates (Spark side)
    assert(back.filter(col("score").isNull).count() ===
      src.filter(col("score").isNull).count())
    assert(back.agg(count(col("name"))).head.getLong(0) ===
      src.agg(count(col("name"))).head.getLong(0))
    assert(back.agg(sum(col("cnt"))).head.getLong(0) ===
      src.agg(sum(col("cnt"))).head.getLong(0))
  }

  test("double and timestamp predicates prune and evaluate exactly") {
    val dir = Files.createTempDirectory("cole_v2_pred").toString
    val src = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_shipdate")
      .orderBy("l_extendedprice") // sorted → per-row-group double stats ranges
    src.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(dir)
    val back = spark.read.format("cole").load(dir)
    // double range
    val dGot = back.filter(col("l_extendedprice") > 50000.0 &&
      col("l_extendedprice") <= 60000.0).count()
    val dWant = src.filter(col("l_extendedprice") > 50000.0 &&
      col("l_extendedprice") <= 60000.0).count()
    assert(dGot === dWant && dWant > 0)
    // double stats actually skip row groups: a probe outside the range
    // reads no data pages (planning is metadata-only)
    ColeIO.opens.set(0)
    assert(back.filter(col("l_extendedprice") > 1e12).count() === 0L)
    assert(ColeIO.opens.get() === 0L,
      s"out-of-range double filter opened ${ColeIO.opens.get()} files (want 0)")
    // timestamp range via micros stats
    val cut = "1996-06-01 00:00:00"
    val tGot = back.filter(col("l_shipdate") >= lit(cut).cast("timestamp")).count()
    val tWant = src.filter(col("l_shipdate") >= lit(cut).cast("timestamp")).count()
    assert(tGot === tWant && tWant > 0)
  }

  test("aggregate pushdown covers doubles; null-bearing tables fall back correctly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_agg").toString
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_returnflag")
      .coalesce(1).write.format("cole").mode("overwrite").save(dir)
    val back = spark.read.format("cole").load(dir)
    val agg = back.agg(sum("l_extendedprice"), min("l_extendedprice"),
      max("l_extendedprice"), count(lit(1)))
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "double sum/min/max must push into the source")
    val want = Tables.lineitem(spark, sfDir)
      .agg(sum("l_extendedprice"), min("l_extendedprice"),
        max("l_extendedprice"), count(lit(1))).head
    val got = agg.head
    assert(got.getDouble(1) === want.getDouble(1)) // min exact
    assert(got.getDouble(2) === want.getDouble(2)) // max exact
    assert(got.getLong(3) === want.getLong(3))
    assert(math.abs(got.getDouble(0) - want.getDouble(0)) <=
      math.ulp(want.getDouble(0)) * 64) // sum: fp order differs
    // grouped double aggregate pushes too
    val grouped = back.groupBy("l_returnflag").agg(sum("l_extendedprice").as("s"))
    assert(grouped.queryExecution.executedPlan.toString.contains("PushedGroupBy"))
    val gGot = grouped.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gWant = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(sum("l_extendedprice").as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gGot.keySet === gWant.keySet)
    gGot.foreach { case (k, v) =>
      assert(math.abs(v - gWant(k)) <= math.ulp(gWant(k)) * 64, s"group $k")
    }

    // null-bearing tables PUSH too (round 6): COUNT(col) answers from
    // footer nullCounts, SUM sweeps the densely-encoded present values —
    // and the result matches exact SQL null semantics
    val nd = Files.createTempDirectory("cole_v2_agg_null").toString
    (0 until 1000).map(i => (i.toLong, if (i % 3 == 0) None else Some(i.toLong)))
      .toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("formatVersion", "2").save(nd)
    val nback = spark.read.format("cole").load(nd)
    val nagg = nback.agg(count(col("v")), sum(col("v")))
    assert(nagg.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "null-bearing table must keep aggregate pushdown (null-aware readers)")
    val nrow = nagg.head
    assert(nrow.getLong(0) === (0 until 1000).count(_ % 3 != 0).toLong)
    assert(nrow.getLong(1) === (0 until 1000).filter(_ % 3 != 0).map(_.toLong).sum)
  }

  test("IsNotNull is claimed and enforced on nullable v2 columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_nn").toString
    (0 until 2000).map(i => (i.toLong, if (i % 5 == 0) None else Some(i * 2.0)))
      .toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("formatVersion", "2").option("rowGroupSize", "256").save(dir)
    val back = spark.read.format("cole").load(dir)
    assert(back.filter(col("v").isNotNull).count() === 1600L)
    // comparison predicates silently drop null rows, like SQL
    assert(back.filter(col("v") >= 0.0).count() === 1600L)
    assert(back.filter(col("v") > 2.0).count() === 1599L) // i=1 fails, nulls drop
    assert(back.filter(col("v").isNull).count() === 400L)
  }

  test("compaction preserves v2 (nullable) tables") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_compact").toString
    val src = (0 until 3000).map(i =>
      (i.toLong, if (i % 4 == 0) None else Some(i * 0.5))).toDF("id", "v")
    // many small files
    (0 until 6).foreach { k =>
      src.filter(col("id") % 6 === k).coalesce(1)
        .write.format("cole").mode("append").option("formatVersion", "2").save(dir)
    }
    val stats = ColeCompact.compact(spark, dir, targetBytes = 1L << 30)
    assert(stats.filesAfter < stats.filesBefore)
    val back = spark.read.format("cole").load(dir)
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
    assert(back.filter(col("v").isNull).count() === 750L)
  }

  test("FLOAT_VECTOR: embeddings round-trip through auto-v2, both read paths") {
    val dir = Files.createTempDirectory("cole_v2_vec").toString
    val src = Tables.embeddings(spark, sfDir)
    src.coalesce(2).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "2048").save(dir)
    assert(headerVersion(dir) === 2, "vector schema must select v2")
    val back = spark.read.format("cole").load(dir)
    assert(back.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
    // claimed filter on a sibling column: the selection vector must
    // compact the vector chunk row-exactly
    val filtered = back.filter(col("vec_id") % 10 === 3).orderBy("vec_id")
    val expect = src.filter(col("vec_id") % 10 === 3).orderBy("vec_id")
    assert(filtered.exceptAll(expect).count() === 0L)
    assert(expect.exceptAll(filtered).count() === 0L)
  }

  test("FLOAT_VECTOR: null rows, empty and ragged vectors round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_vec_null").toString
    val src = (0 until 3000).map { i =>
      val vec =
        if (i % 7 == 0) None // null row
        else if (i % 5 == 0) Some(Array.empty[Float]) // empty vector
        else Some(Array.tabulate(i % 9 + 1)(j => (i * 31 + j) * 0.25f - 40f))
      (i.toLong, vec)
    }.toDF("id", "emb")
    src.coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(dir)
    val back = spark.read.format("cole").load(dir)
    assert(back.schema("emb").nullable)
    assert(back.exceptAll(src).count() === 0L)
    assert(src.exceptAll(back).count() === 0L)
    assert(back.filter(col("emb").isNull).count() ===
      src.filter(col("emb").isNull).count())
    assert(back.filter(size(col("emb")) === 0).count() ===
      src.filter(size(col("emb")) === 0).count())
  }

  test("FLOAT_VECTOR: null ELEMENTS are rejected loudly, not zero-filled") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_vec_badelem").toString
    val src = Seq((1L, Seq(Some(1.0f), None, Some(3.0f)))).toDF("id", "emb")
    val e = intercept[org.apache.spark.SparkException] {
      src.coalesce(1).write.format("cole").mode("overwrite").save(dir)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[ColeFormat.ColeFormatException] &&
      c.getMessage.contains("null element")))
  }

  test("FLOAT_VECTOR: partitioned tables carry vectors; group-by pushdown declines vector keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_vec_part").toString
    val src = (0 until 1200).map { i =>
      (i.toLong, i % 3, Array.tabulate(8)(j => (i + j) * 0.5f))
    }.toDF("id", "bucket", "emb")
    src.write.format("cole").mode("overwrite")
      .partitionBy("bucket").save(dir)
    val back = spark.read.format("cole").load(dir)
    assert(back.count() === 1200L)
    val rows = back.select("id", "emb").exceptAll(src.select("id", "emb"))
    assert(rows.count() === 0L)
    // grouping by the vector column must NOT be claimed by the source
    // (the agg readers accumulate scalar keys) — Spark aggregates it
    val byVec = back.groupBy("emb").count()
    assert(!byVec.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "vector group keys must fall back to the normal scan")
    assert(byVec.count() === 1200L) // all vectors distinct
  }

  test("FLOAT_VECTOR: vectors flow through the streaming source and sink") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_vec_stream").toString
    val outDir = Files.createTempDirectory("cole_v2_vec_stream_out").toString
    val cp = Files.createTempDirectory("cole_v2_vec_stream_cp").toString
    def batch(from: Int, until: Int) =
      (from until until).map(i => (i.toLong, Array.tabulate(6)(j => i + j * 0.125f)))
        .toDF("id", "emb")
    batch(0, 200).coalesce(1).write.format("cole").mode("append").save(dir)
    def drain(): Unit = {
      val q = spark.readStream.format("cole").load(dir)
        .writeStream.format("cole")
        .option("path", outDir).option("checkpointLocation", cp)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
      q.processAllAvailable()
      q.stop()
    }
    drain()
    batch(200, 500).coalesce(2).write.format("cole").mode("append").save(dir)
    drain()
    val out = spark.read.format("cole").load(outDir)
    val expect = batch(0, 500)
    assert(out.count() === 500L)
    assert(out.exceptAll(expect).count() === 0L)
    assert(expect.exceptAll(out).count() === 0L)
  }

  test("v2 page CRC: a flipped body bit fails loudly, never decodes to plausible values") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_crc").toString
    (0 until 4000).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "1024").save(dir)
    assert(headerVersion(dir) === 2)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".col")).head
    // undamaged reads fine
    assert(spark.read.format("cole").load(dir).count() === 4000L)
    // flip one bit in the DOUBLE column's page body (located from the
    // footer, so the damage is provably in value bytes, not a header)
    val pos = {
      val r = new ColeFileReader(f.getPath,
        new org.apache.hadoop.conf.Configuration())
      try {
        val cc = r.meta.rowGroups(0).chunks(1)
        cc.fileOffset + cc.totalSize - 2
      } finally r.close()
    }
    val raf = new java.io.RandomAccessFile(f, "rw")
    try {
      raf.seek(pos)
      val b = raf.read()
      raf.seek(pos)
      raf.write(b ^ 0x10)
    } finally raf.close()
    // remove Hadoop LocalFileSystem's own .crc sidecar: on object stores
    // there is no such sidecar, and the FORMAT-level crc must stand alone
    new java.io.File(f.getParent, s".${f.getName}.crc").delete()
    // no cache to bust: the footer cache holds metadata only, page
    // bodies are read fresh by every query
    val e = intercept[Throwable] {
      spark.read.format("cole").load(dir).agg(sum(col("v"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("page checksum mismatch"))),
      s"expected the format-level page checksum failure, got: $e")
  }

  test("v2 metadata CRC: a flipped stats bit cannot silently mis-prune") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cole_v2_metacrc").toString
    (0 until 4000).map(i => (i.toLong, i * 1.5)).toDF("id", "v")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "1024").save(dir)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".col")).head
    // locate the metadata block from the trailing footer, then flip a bit
    // INSIDE it (where the planner-trusted page stats live)
    val raf = new java.io.RandomAccessFile(f, "rw")
    try {
      raf.seek(f.length() - 8)
      val b = new Array[Byte](8)
      raf.readFully(b)
      val metaOffset = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      val pos = metaOffset + (f.length() - 16 - metaOffset) / 2
      raf.seek(pos)
      val x = raf.read()
      raf.seek(pos)
      raf.write(x ^ 0x04)
    } finally raf.close()
    new java.io.File(f.getParent, s".${f.getName}.crc").delete()
    val e = intercept[Throwable] {
      new ColeFileReader(f.getPath,
        new org.apache.hadoop.conf.Configuration()).meta
    }
    assert(Option(e.getMessage).exists(_.contains("checksum")) ||
      e.isInstanceOf[ColeFormat.ColeFormatException],
      s"expected a loud metadata failure, got: $e")
    assert(Option(e.getMessage).exists(_.contains("metadata checksum mismatch")),
      s"expected the metadata CRC to catch it, got: $e")
  }
}
