package graft.sources.cole

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O(delta) merge-on-read delete serving (r11): a vector DELETE of k
  * rows is served by opening the row groups those k ordinals TOUCH —
  * not by decoding the whole vectored file set and filtering after.
  * Pinned here for both serve paths:
  *
  *   - the batch feed's ordinal read restricts its scan to the touched
  *     groups (`FeedRowGroupsOption` → `ColeSnapshot.rgKeep`), asserted
  *     via the JVM-wide decode counter;
  *   - the CDF stream's delete partitions drop untouched groups at
  *     planning AND ship only each partition's own ordinal slice —
  *     never the commit's file-wide vector per partition (the 7-10 MB ×
  *     every-partition task-weight shape the sf1 bench measured).
  *
  * Values must be identical to the unpruned read — pruning is a pure
  * plan restriction.
  */
class ColeMorDeltaReadSpec extends AnyFunSuite {

  private lazy val warehouse = Files.createTempDirectory("cole_mor_wh").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.mor", "graft.sources.cole.ColeCatalog")
    s.conf.set("spark.sql.catalog.mor.warehouse", warehouse)
    s
  }

  // 16384 rows in ONE file of 32 × 512-row groups; k equals the file
  // ordinal (single writer task preserves order)
  private def fixture(name: String): String = {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/$name"
    (0 until 16384).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "g")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(t)
    spark.sql(s"CALL mor.system.versioning('db.$name')") // v1 baseline
    spark.sql(s"CALL mor.system.delete_mode('db.$name', 'vector')")
    // ordinals 1000..1099 → groups 1 and 2 of 32
    spark.sql(s"DELETE FROM mor.db.$name WHERE k >= 1000 AND k < 1100") // v2
    t
  }

  test("batch feed serves a vector-DELETE delta by decoding only touched row groups") {
    val t = fixture("batch")
    val before = ColeReaderMetrics.rowGroupsDecoded.get()
    val rows = ColeChangeFeed.read(spark, t, 1L, 2L)
      .select("k", "_change_type").collect()
    val decoded = ColeReaderMetrics.rowGroupsDecoded.get() - before
    assert(rows.length === 100)
    assert(rows.forall(_.getString(1) == "delete"))
    assert(rows.map(_.getLong(0)).sorted.toSeq === (1000L until 1100L))
    // 2 touched groups of 32; small slack for a re-executed stage, none
    // for an O(file) read (32 would fail)
    assert(decoded <= 4L,
      s"served a 2-group delta by decoding $decoded row groups (file has 32)")
  }

  test("CDF stream plans only touched row groups and ships per-partition ordinal slices") {
    val t = fixture("stream")
    val planned0 = ColeCdfStream.deleteRowGroupsPlanned.get()
    val decoded0 = ColeReaderMetrics.rowGroupsDecoded.get()
    val sink = "mor_stream_sink"
    val cp = Files.createTempDirectory("cole_mor_cp").toString
    val q = spark.readStream.format("cole").option("changeFeed", "true")
      .load(t)
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", cp).start()
    try q.processAllAvailable() finally q.stop()
    // planInputPartitions runs several times per micro-batch (schema /
    // stats / execution), so the planning counter is per-PASS: any pass
    // planning O(file) would contribute 32 at once
    val planned = ColeCdfStream.deleteRowGroupsPlanned.get() - planned0
    assert(planned > 0 && planned < 32L,
      s"a planning pass planned $planned row groups for a 2-group delta")
    // end-to-end: the executed batch decodes the 32 baseline-insert
    // groups plus the 2 touched delete groups — an O(file) delete side
    // would double the file (≥ 64)
    val decoded = ColeReaderMetrics.rowGroupsDecoded.get() - decoded0
    assert(decoded <= 40L,
      s"stream batch decoded $decoded row groups (34 expected, O(file) ≥ 64)")
    val dels = spark.table(sink)
      .filter(col("_change_type") === "delete").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(dels === (1000L until 1100L))
    // the stream's insert side still served the full baseline
    assert(spark.table(sink)
      .filter(col("_change_type") === "insert").count() === 16384L)
  }

  test("sparse delta across many groups: decode count tracks touched groups, values exact") {
    val s = spark
    import s.implicits._
    val t = s"$warehouse/db/sparse"
    (0 until 16384).map(i => (i.toLong, (i % 7).toLong)).toDF("k", "g")
      .coalesce(1).write.format("cole").mode("overwrite")
      .option("rowGroupSize", "512").save(t)
    spark.sql("CALL mor.system.versioning('db.sparse')")
    spark.sql("CALL mor.system.delete_mode('db.sparse', 'vector')")
    // one row from each of 8 scattered groups (k ≡ 100 mod 2048)
    spark.sql("DELETE FROM mor.db.sparse WHERE k % 2048 = 100") // v2
    val before = ColeReaderMetrics.rowGroupsDecoded.get()
    val rows = ColeChangeFeed.read(spark, t, 1L, 2L)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    val decoded = ColeReaderMetrics.rowGroupsDecoded.get() - before
    assert(rows === (0 until 8).map(i => i * 2048L + 100L))
    assert(decoded <= 12L,
      s"8 touched groups of 32 decoded $decoded (O(file) would be 32)")
  }
}
