package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity: the streaming pipelines replayed over the
  * sf0.001 events table must agree with their batch twins — the same
  * batch queries the DuckDB oracle already validates.
  */
class EventsPipelineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  /** Events in global event-time order, as a replayable in-memory seq. */
  private def orderedEvents(): Seq[Event] = {
    val s = spark
    import s.implicits._
    graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
      .collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
  }

  /** Feed events through MemoryStream in `chunks` micro-batches and run the
    * query to completion in Update mode against a memory sink.
    */
  private def runStream[T](name: String, chunks: Int,
      build: MemoryStream[Event] => org.apache.spark.sql.DataFrame,
      mode: OutputMode = OutputMode.Update): org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    val source = MemoryStream[Event](spark)
    val events = orderedEvents()
    val q = build(source)
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    events.grouped(math.max(1, events.size / chunks + 1)).foreach { batch =>
      source.addData(batch)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
  }

  test("windowed agg: streaming over micro-batches == batch twin") {
    val streamed = runStream("win_stream", 3,
      src => EventsPipeline.windowedAgg(src.toDF()))
      // Update mode re-emits a window each time it changes; the final state
      // of each (hour, type) group is the row with the highest count.
      .groupBy("hour_start", "event_type")
      .agg(max(struct(col("n"), col("sum_value"))).as("last"))
      .select(col("hour_start"), col("event_type"),
        col("last.n").as("n"), col("last.sum_value").as("sum_value"))

    val batch = EventsPipeline.windowedAgg(graft.Tables.events(spark, sfDir))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("flatMapGroupsWithState sessionize == batch lag+prefix-sum twin") {
    val s = spark
    import s.implicits._
    val streamed = runStream("sess_stream", 4,
      src => EventsPipeline.sessionize(src.toDS()).toDF())
      // cumulative totals: keep the last (= max) per user
      .groupBy("user_id")
      .agg(max(col("n_sessions")).as("n_sessions"), max(col("n_events")).as("n_events"))

    // batch twin — same logic as RelationalSuite events_sessionize
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val batch = graft.Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > EventsPipeline.SessionGapMicros, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))

    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("native session_window agg: batch session count == stateful twin") {
    // session_window (gap < 30min joins a session) vs the lag twin
    // (gap > 30min starts one): equivalent off exact-boundary ties, and the
    // synthetic data has none — verified here per user.
    val viaWindow = EventsPipeline.sessionWindowAgg(graft.Tables.events(spark, sfDir))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val viaLag = graft.Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > EventsPipeline.SessionGapMicros, 1L)
          .otherwise(0L))
      .groupBy("user_id").agg(sum(col("new_s")).as("n_sessions"))
    assert(viaWindow.exceptAll(viaLag).count() === 0)
    assert(viaLag.exceptAll(viaWindow).count() === 0)
  }

  test("streaming dedup(event_id) == batch dropDuplicates") {
    val s = spark
    import s.implicits._
    // duplicate every 10th event to give the dedup something to drop
    val source = MemoryStream[Event](spark)
    val events = orderedEvents()
    val withDups = events.flatMap(e =>
      if (e.event_id % 10 == 0) Seq(e, e) else Seq(e))
    val q = EventsPipeline.dedupStream(source.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append).start()
    withDups.grouped(withDups.size / 3 + 1).foreach { b =>
      source.addData(b); q.processAllAvailable()
    }
    q.stop()
    assert(spark.table("dedup_stream").count() === events.size)
    assert(spark.table("dedup_stream").select("event_id").distinct().count() === events.size)
  }

  test("watermarked stream-stream interval join == batch range join twin") {
    val streamed = runStream("ssjoin_stream", 3,
      src => EventsPipeline.purchaseClickJoin(src.toDF(), watermark = "10 minutes"),
      mode = OutputMode.Append)
    val batch = EventsPipeline.purchaseClickJoin(graft.Tables.events(spark, sfDir))
    assert(batch.count() > 0, "twin join matched nothing — test data too sparse")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming -> COLE sink via foreachBatch round-trips") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cole_stream").toString
    val source = MemoryStream[Event](spark)
    val events = orderedEvents()
    // each micro-batch appends its rows as a COLE table partition
    val q = source.toDF().select("event_id", "user_id", "event_type")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.format("cole").mode("append").save(s"$dir/batch_$id")
      }.start()
    events.grouped(events.size / 2 + 1).foreach { b =>
      source.addData(b); q.processAllAvailable()
    }
    q.stop()
    val back = new java.io.File(dir).listFiles().map(f =>
      spark.read.format("cole").load(f.getPath)).reduce(_ unionAll _)
    assert(back.count() === events.size)
    assert(back.select("event_id").distinct().count() === events.size)
  }

  test("COLE is the streaming transport: cole source -> windowed agg == batch twin") {
    // the full composition §2.3 × §2.8: events live in the NATIVE format
    // (v2 timestamps + doubles), stream OUT of it in bounded micro-batches,
    // and the watermarked windowed agg over that stream must agree with
    // the batch twin over the same .col table — no parquet in the loop
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cole_transport").toString
    val events = orderedEvents()
    // three time-ordered appends, ONE file each (coalesce) — so the
    // per-file trigger replay preserves event-time order and the 1-hour
    // watermark never sees in-slice stragglers as late
    events.grouped(events.size / 3 + 1).foreach { slice =>
      slice.toDF().coalesce(1).write.format("cole").mode("append").save(dir)
    }
    val q = EventsPipeline.windowedAgg(
        s.readStream.format("cole").option("maxFilesPerTrigger", "1").load(dir))
      .writeStream.format("memory").queryName("cole_transport_win")
      .outputMode(OutputMode.Update).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cole_transport_win")
      .groupBy("hour_start", "event_type")
      .agg(max(struct(col("n"), col("sum_value"))).as("last"))
      .select(col("hour_start"), col("event_type"),
        col("last.n").as("n"), col("last.sum_value").as("sum_value"))
    val batch = EventsPipeline.windowedAgg(spark.read.format("cole").load(dir))
    assert(batch.count() > 0)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("streaming session_window end-to-end produces rows") {
    // Session-window streaming aggs emit only finalized sessions → Append
    // mode; the watermark (event-time high-mark minus 10min) closes all but
    // the trailing sessions once the ordered replay finishes.
    val streamed = runStream("sesswin_stream", 2,
      src => EventsPipeline.sessionWindowAgg(src.toDF(), watermark = "10 minutes"),
      mode = OutputMode.Append)
    assert(streamed.count() > 0)
  }
}
