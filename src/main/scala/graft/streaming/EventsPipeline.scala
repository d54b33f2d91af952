package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A single event row (mirrors `events.parquet` minus the free-form props). */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Cumulative per-user sessionization result emitted by [[EventsPipeline.sessionize]]. */
case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** State carried between micro-batches per user: last event time (µs) and
  * running session/event counters.
  */
case class SessionState(lastTsMicros: Long, nSessions: Long, nEvents: Long)

/** SURVEY §2.8 — Structured Streaming twins of the batch events queries.
  *
  * Every transform here is written against a plain DataFrame/Dataset so the
  * SAME code path serves batch (parquet) and streaming (`readStream` /
  * `MemoryStream`) inputs — Spark's unified model makes the batch queries in
  * `RelationalSuite` (#31 `events_window`, #32 `events_sessionize`) the
  * oracle for these streaming versions, which `EventsPipelineSpec` asserts.
  *
  * Scale posture: the windowed agg is a keyed stateful aggregation whose
  * state is bounded by the watermark (late data beyond it is dropped and its
  * state evicted); sessionization state is one small record per active user,
  * partitioned by user_id across executors.
  */
object EventsPipeline {

  /** 30-minute inactivity gap, in microseconds (matches the batch twin). */
  val SessionGapMicros: Long = 1800L * 1000000L

  private def micros(ts: java.sql.Timestamp): Long = {
    val i: Instant = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Tumbling 1-hour window × event_type aggregation — twin of batch
    * #31 `events_window`. On a streaming input a watermark bounds state.
    */
  def windowedAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Native session windows (30-min gap) — Spark's built-in
    * `session_window` expresses gap-based sessions declaratively; state
    * merging/eviction is handled by the engine.
    */
  def sessionWindowAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("n_events"))
  }

  /** Streaming deduplication by event_id. On a stream, state is bounded by
    * the watermark (`dropDuplicatesWithinWatermark`): an id only needs
    * remembering until no in-watermark duplicate can still arrive —
    * without it, exact-once dedup state grows forever at 100 TB/day.
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Watermarked stream-stream interval join: each purchase matched to the
    * same user's clicks in the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the state store
    * evicts rows as the watermark advances — the streaming twin of the
    * batch range join (#57).
    */
  def purchaseClickJoin(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val purchases = {
      val b = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
      if (b.isStreaming) b.withWatermark("p_ts", watermark) else b
    }
    val clicks = {
      val b = events.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      if (b.isStreaming) b.withWatermark("c_ts", watermark) else b
    }
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") < col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select("purchase_id", "user_id", "p_ts", "click_id", "c_ts")
  }

  /** Custom stateful sessionization via `flatMapGroupsWithState` — the
    * streaming twin of batch #32 `events_sessionize` (new session when the
    * gap since the previous event exceeds 30 minutes; emits cumulative
    * per-user totals each micro-batch).
    *
    * Events are sorted by (ts, event_id) within each micro-batch; across
    * batches the state's `lastTsMicros` stitches the sequence together, so
    * per-user event-time order across micro-batches is assumed (enforce
    * upstream with a watermark + sorted replay, as the spec does).
    */
  def sessionize(events: Dataset[Event]): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val us = micros(e.ts)
            val newSession =
              st.lastTsMicros == Long.MinValue || us - st.lastTsMicros > SessionGapMicros
            st = SessionState(
              us,
              st.nSessions + (if (newSession) 1L else 0L),
              st.nEvents + 1L)
          }
          if (sorted.nonEmpty) {
            state.update(st)
            Iterator.single(UserSessions(userId, st.nSessions, st.nEvents))
          } else Iterator.empty
      }
  }
}
