package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the `events` feed — the continuous
  * counterpart of the batch `events_hourly` rollup.
  *
  * The reference indexes a live stream (its Tokio poll loop) but can
  * only answer questions about it by re-querying Postgres; a
  * Spark-native engine answers them *on the stream*: watermarked
  * windowed aggregation for the rollup, `flatMapGroupsWithState` for
  * per-user sessionization. Both operators are incremental — state is
  * bounded by the watermark, so they run indefinitely on an unbounded
  * feed (the 100 TB posture: state size is O(open windows + open
  * sessions), never O(stream)).
  *
  * `ts` is epoch-nanos LongType everywhere in this engine (see
  * [[graft.tables.Fixtures.events]]).
  */
object StreamAnalytics {

  /** Attach an event-time column derived from epoch-nanos `ts`.
    * Nanos → micros is a lossless integer division for our data
    * (micros resolution is what TimestampType holds anyway). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros((col("ts") / 1000L).cast("long")))

  /** Hourly rollup per event_type with a watermark: the streaming twin
    * of the batch `events_hourly` query. In append mode a window emits
    * exactly once, when the watermark passes its end — downstream
    * sinks see each hour exactly once.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .select(
        unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact dedup of a keyed feed: drop rows whose key was
    * already seen within the watermark horizon. State is one entry per
    * distinct key inside the horizon — watermark-bounded, so the
    * operator runs forever on an unbounded stream (the streaming twin
    * of the batch `dedup_exact` / idempotent-append Q-20 semantics:
    * at-least-once upstream in, effectively-once downstream out). */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
                     watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  case class SessionEvent(user_id: Long, ts: Long, event_type: String, value: Double)

  /** Internal row shape after [[withEventTime]]; must stay public —
    * the codegen'd deserializer calls the constructor reflectively. */
  case class TimedEvent(user_id: Long, ts: Long, event_type: String,
                        value: Double, event_time: java.sql.Timestamp)

  case class SessionState(start: Long, last: Long, n: Long, sumValue: Double)

  case class UserSession(user_id: Long, session_start: Long, session_end: Long,
                         n_events: Long, sum_value: Double)

  /** Gap-based per-user sessionization with event-time timeout.
    *
    * A session closes when the watermark passes `last event + gap`;
    * the closed session is emitted exactly once (append). State per
    * key is one [[SessionState]] — constant-size, watermark-bounded,
    * so the operator scales to arbitrarily many users (state is
    * hash-partitioned on user_id across executors).
    */
  def sessionize(events: Dataset[SessionEvent], gapNanos: Long,
                 watermark: String = "1 hour"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    withEventTime(events.toDF()).as[TimedEvent]
      .withWatermark("event_time", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, s.start, s.last, s.n, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts - s.last <= gapNanos =>
                  cur = Some(SessionState(s.start, math.max(s.last, e.ts), s.n + 1, s.sumValue + e.value))
                case Some(s) =>
                  closed ::= UserSession(userId, s.start, s.last, s.n, s.sumValue)
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when watermark passes last-event + gap
              state.setTimeoutTimestamp(s.last / 1000000L + gapNanos / 1000000L)
            }
            closed.reverseIterator
          }
      }
  }
}
