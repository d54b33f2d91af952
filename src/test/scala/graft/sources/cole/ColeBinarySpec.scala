package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Format v2 BINARY columns (r11): opaque variable-length bytes stored
  * natively in .col — the multimodal payload type. Pages reuse the
  * PLAIN/DICT strings layout (it never assumed UTF-8); the Spark face is
  * BinaryType. No stats, no predicate claims, no aggregate pushdown —
  * payload bytes are cargo, not keys.
  */
class ColeBinarySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))

  private def rows(n: Int): Seq[Row] = (0 until n).map { i =>
    val blob: Array[Byte] =
      if (i % 11 == 3) null
      else if (i % 7 == 0) Array.empty[Byte]
      else Array.tabulate((i % 97) + 1)(j => ((i * 31 + j * 7) % 256).toByte)
    Row(i.toLong, blob)
  }

  test("binary round-trips byte-exact: nulls, empty blobs, full 0-255 byte range") {
    val dir = Files.createTempDirectory("cole_bin_rt").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows(500), 2), schema)
    df.write.format("cole").mode("overwrite")
      .option("rowGroupSize", "64").save(dir)
    val back = spark.read.format("cole").load(dir)
    assert(back.schema("blob").dataType === BinaryType)
    val exp = rows(500).map(r => r.getLong(0) ->
      Option(r.get(1).asInstanceOf[Array[Byte]]).map(_.toSeq)).toMap
    val got = back.collect().map(r => r.getLong(0) ->
      Option(r.get(1).asInstanceOf[Array[Byte]]).map(_.toSeq)).toMap
    assert(got === exp)
    // row (non-columnar) path too: a projection with _cole_pos disables
    // the columnar reader
    val viaRow = back.selectExpr("id", "blob", "_cole_pos").collect()
      .map(r => r.getLong(0) ->
        Option(r.get(1).asInstanceOf[Array[Byte]]).map(_.toSeq)).toMap
    assert(viaRow === exp)
  }

  test("repeated payloads take the DICTIONARY page path and decode identically") {
    val dir = Files.createTempDirectory("cole_bin_dict").toString
    val s = spark
    import s.implicits._
    // 8 distinct blobs over 4096 rows: chooseStrEnc picks DICTIONARY
    val blobs = (0 until 8).map(k => Array.tabulate(64)(j => ((k * 13 + j) % 256).toByte))
    val df = (0 until 4096).map(i => (i.toLong, blobs(i % 8))).toDF("id", "blob")
    df.coalesce(1).write.format("cole").mode("overwrite").save(dir)
    val meta = new ColeFileReader(
      ColeIO.listPartitioned(dir, ColeIO.driverConf()).head._1.getPath.toString,
      ColeIO.driverConf())
    try {
      val ci = meta.meta.columns.indexWhere(_.name == "blob")
      assert(meta.meta.columns(ci).colType === ColeFormat.TBinary)
      assert(meta.meta.rowGroups.head.chunks(ci).pages
        .forall(_.encoding == ColeFormat.Dict),
        "8-distinct-value binary column should write DICTIONARY pages")
    } finally meta.close()
    val back = spark.read.format("cole").load(dir)
      .collect().map(r => r.getLong(0) -> r.get(1).asInstanceOf[Array[Byte]].toSeq)
    assert(back.toMap === (0 until 4096).map(i => i.toLong -> blobs(i % 8).toSeq).toMap)
  }

  test("binary survives page compression; v1 format refuses the type loudly") {
    val dir = Files.createTempDirectory("cole_bin_z").toString
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows(300), 1), schema)
    df.write.format("cole").mode("overwrite")
      .option("compress", "deflate").save(dir)
    assert(spark.read.format("cole").load(dir)
      .agg(sum(length(col("blob")))).head.getLong(0) ===
      rows(300).map(r => Option(r.get(1).asInstanceOf[Array[Byte]])
        .map(_.length.toLong).getOrElse(0L)).sum)
    val err = intercept[Exception] {
      df.write.format("cole").mode("overwrite")
        .option("formatVersion", "1")
        .save(Files.createTempDirectory("cole_bin_v1").toString)
    }
    assert(err.getMessage.toLowerCase.contains("v1") ||
      err.getMessage.toLowerCase.contains("version"),
      s"v1 must reject BINARY loudly, got: ${err.getMessage}")
  }

  test("multimodal pipeline parity: features from .col-served payloads equal the parquet-direct run") {
    val s = spark
    import s.implicits._
    val docs = (0 until 300)
      .map(i => (i.toLong, s"doc $i body " + ("x" * (i % 40)), "en"))
      .toDF("doc_id", "text", "lang")
    val media = graft.operators.Multimodal.withPayload(docs)
    val dir = Files.createTempDirectory("cole_bin_media").toString
    media.select(col("doc_id"), col("payload"),
        col("meta.modality").as("modality"), col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_bytes").as("n_bytes"))
      .write.format("cole").mode("overwrite").save(dir)
    val mediaCole = spark.read.format("cole").load(dir)
      .select(col("doc_id"), col("payload"),
        struct(col("modality"), col("width"), col("height"),
          col("sample_rate"), col("n_bytes")).as("meta"))
    val direct = graft.operators.Multimodal.extractFeatures(media)
      .collect().sortBy(_.doc_id)
    val served = graft.operators.Multimodal.extractFeatures(mediaCole)
      .collect().sortBy(_.doc_id)
    assert(served.toSeq === direct.toSeq)
    val framesDirect = graft.operators.Multimodal.sampleFrames(media)
      .collect().map(f => (f.doc_id, f.frame_idx, f.offset, f.checksum)).sorted
    val framesServed = graft.operators.Multimodal.sampleFrames(mediaCole)
      .collect().map(f => (f.doc_id, f.frame_idx, f.offset, f.checksum)).sorted
    assert(framesServed.toSeq === framesDirect.toSeq)
  }
}
