package graft.sources.cole

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

object ColeStreamManifestSpec {
  // top-level: MemoryStream encoders can't capture a suite-inner class
  case class SinkRow(id: Long, grp: String, v: Long)
}

/** The sink-maintained epoch manifest and its interaction with the
  * streaming source: bounded per-trigger listing, compaction-aware
  * admission, and file-log snapshots that bound restart cost.
  */
class ColeStreamManifestSpec extends AnyFunSuite {
  import ColeStreamManifestSpec.SinkRow

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def rows(from: Int, until: Int): Seq[SinkRow] =
    (from until until).map(i => SinkRow(i.toLong, s"g${i % 3}", i.toLong * 2))

  test("sink-fed source stops full listings after warm-up (manifest tailing)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val dir = Files.createTempDirectory("cole_manifest_o1").toString
    val cpW = Files.createTempDirectory("cole_manifest_o1_cpw").toString
    val cpR = Files.createTempDirectory("cole_manifest_o1_cpr").toString
    val source = MemoryStream[SinkRow]
    val writer = source.toDF().writeStream.format("cole")
      .option("path", dir).option("checkpointLocation", cpW)
      .outputMode(OutputMode.Append).start()
    source.addData(rows(0, 50)); writer.processAllAvailable()

    val reader = s.readStream.format("cole").load(dir)
      .writeStream.format("memory").queryName("cole_manifest_o1_out")
      .option("checkpointLocation", cpR)
      .outputMode(OutputMode.Append).start()
    reader.processAllAvailable()
    val warm = ColeMicroBatchStream.tableListings.get()

    // many more epochs: admission must ride the manifest, not listings
    (1 to 5).foreach { k =>
      source.addData(rows(k * 50, k * 50 + 50))
      writer.processAllAvailable()
      reader.processAllAvailable()
    }
    assert(ColeMicroBatchStream.tableListings.get() === warm,
      s"source re-listed the table ${ColeMicroBatchStream.tableListings.get() - warm} " +
        "times after warm-up (want 0: manifest tailing)")
    assert(s.table("cole_manifest_o1_out").count() === 300L)
    writer.stop(); reader.stop()
  }

  test("compacted files of already-processed rows are not re-emitted") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_compact_stream").toString
    val cp = Files.createTempDirectory("cole_compact_stream_cp").toString
    // batch-written table (no manifest → listing mode), many small files
    (0 until 4).foreach(k =>
      rows(k * 25, k * 25 + 25).toDF().coalesce(1)
        .write.format("cole").mode("append").save(dir))
    // foreachBatch: the one memory-visible sink that also supports
    // checkpoint RECOVERY (needed for the restart leg below)
    val received = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = s.readStream.format("cole").load(dir)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          received.addAndGet(b.count()); ()
      }
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()
    val q = start()
    q.processAllAvailable()
    assert(received.get() === 100L)

    // offline compaction rewrites all 4 files into 1 — the rows were all
    // processed, so the compacted file must be SKIPPED, not replayed
    val skipsBefore = ColeMicroBatchStream.compactionSkips.get()
    val stats = ColeCompact.compact(s, dir, targetBytes = 1L << 30)
    assert(stats.filesAfter === 1 && stats.filesBefore === 4)
    q.processAllAvailable()
    assert(received.get() === 100L,
      "compaction output replayed already-processed rows into the stream")
    assert(ColeMicroBatchStream.compactionSkips.get() > skipsBefore)

    // FRESH files appended after the compaction still arrive
    rows(100, 120).toDF().coalesce(1).write.format("cole").mode("append").save(dir)
    q.processAllAvailable()
    assert(received.get() === 120L)
    q.stop()

    // and a RESTART (fresh seen-set rebuilt from the log) must reach the
    // same skip decision from the durable compaction record
    val q2 = start()
    q2.processAllAvailable()
    assert(received.get() === 120L, "restart replayed compacted rows")
    q2.stop()
  }

  test("row-level DML replacements are not re-emitted into a tailing stream") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("cole_dml_stream_wh").toString
    s.conf.set("spark.sql.catalog.dmlw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.dmlw.warehouse", wh)
    val dir = s"$wh/db/t"
    val cp = Files.createTempDirectory("cole_dml_stream_cp").toString
    (0 until 4).foreach(k =>
      rows(k * 25, k * 25 + 25).toDF().coalesce(1)
        .write.format("cole").mode("append").save(dir))
    val received = new java.util.concurrent.atomic.AtomicLong(0)
    val q = s.readStream.format("cole").load(dir)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          received.addAndGet(b.count()); ()
      }
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    assert(received.get() === 100L)
    // an UPDATE rewrites files whose rows the stream already processed:
    // Append-source semantics — the replacement files must be SKIPPED
    // (same contract as compaction and DELETE), never replayed
    spark.sql("UPDATE dmlw.db.t SET v = v + 1 WHERE id < 30")
    q.processAllAvailable()
    assert(received.get() === 100L,
      "UPDATE replacement files replayed already-processed rows")
    // fresh appends after the DML still flow
    rows(100, 115).toDF().coalesce(1).write.format("cole").mode("append").save(dir)
    q.processAllAvailable()
    assert(received.get() === 115L)
    q.stop()
  }

  test("readStream.table over a catalog table tails like the path source") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("cole_rst_wh").toString
    s.conf.set("spark.sql.catalog.rstw", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.rstw.warehouse", wh)
    val cp = Files.createTempDirectory("cole_rst_cp").toString
    rows(0, 40).toDF().coalesce(1)
      .write.format("cole").mode("overwrite").save(s"$wh/db/t")
    val received = new java.util.concurrent.atomic.AtomicLong(0)
    val q = s.readStream.table("rstw.db.t")
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          received.addAndGet(b.count()); ()
      }
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    assert(received.get() === 40L)
    // appends through the catalog flow into the stream
    rows(40, 70).toDF().createOrReplaceTempView("rst_more")
    spark.sql("INSERT INTO rstw.db.t SELECT * FROM rst_more")
    q.processAllAvailable()
    assert(received.get() === 70L)
    q.stop()
  }

  test("file log snapshots bound entry count; restart resumes from snapshot") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("cole_log_snap").toString
    val cp = Files.createTempDirectory("cole_log_snap_cp").toString
    // seed one file (schema inference needs it), then 20 one-file
    // admissions — well past the snapshot interval
    rows(0, 10).toDF().coalesce(1).write.format("cole").mode("append").save(dir)
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def start() = s.readStream.format("cole")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => ids.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append).start()
    val q = start()
    (1 until 20).foreach { k =>
      rows(k * 10, k * 10 + 10).toDF().coalesce(1)
        .write.format("cole").mode("append").save(dir)
      q.processAllAvailable()
    }
    q.processAllAvailable()
    assert(ids.size === 200)
    q.stop()
    val log = new java.io.File(cp, "sources/0/cole-file-log")
    val names = log.listFiles().map(_.getName).filterNot(_.startsWith("."))
    val entries = names.count(_.forall(_.isDigit))
    val snaps = names.count(_.endsWith(".snap"))
    assert(snaps === 1, s"want exactly one live snapshot, log: ${names.toSeq.sorted}")
    assert(entries < 20,
      s"snapshot did not prune committed entries, log: ${names.toSeq.sorted}")

    // restart: seen-set rebuilt from snapshot + tail; no replay, new data flows
    ids.clear()
    val q2 = start()
    rows(200, 210).toDF().coalesce(1).write.format("cole").mode("append").save(dir)
    q2.processAllAvailable()
    assert(ids.asScala.toSet === (200L until 210L).toSet,
      s"restart must resume exactly past the snapshot, got ${ids.size} ids")
    q2.stop()
  }
}
