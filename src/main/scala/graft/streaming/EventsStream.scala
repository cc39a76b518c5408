package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming variant of the events analytics: the same
  * tumbling-window aggregation `Analytics.eventsWindow` computes in batch,
  * expressed as `readStream → watermark → window agg → sink`.
  *
  * The batch and streaming plans share the aggregation logic, so a backfill
  * (batch over the parquet history) and the live stream produce identical
  * windows — the lambda-architecture guarantee, for free, because both are
  * the same declarative plan. Watermarking bounds state: at 100 TB/day the
  * window state held per executor is (windows in flight × groups), never
  * the events themselves.
  */
object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared aggregation: 1-hour tumbling windows per event_type. */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Microsecond-precision timestamp format for the json file source —
    * the default format truncates to milliseconds, which would shift
    * session boundaries relative to the parquet-sourced batch plan. */
  final val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** File-source stream over a directory of event files (json lines),
    * 10-minute watermark, windowed aggregation. */
  def stream(spark: SparkSession, dir: String): DataFrame =
    windowAgg(
      spark.readStream
        .schema(eventSchema)
        .option("timestampFormat", TsFormat)
        .json(dir)
        .withWatermark("ts", "10 minutes"))

  // --- sessionization with custom state ------------------------------------

  /** Gap defining a session boundary (micros) — same 30 minutes as the
    * batch `Analytics.sessionize`. */
  final val SessionGapMicros: Long = 30L * 60 * 1000000

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Open-session state kept per user between micro-batches (micros). */
  case class OpenSession(start: Long, last: Long, n: Long, sum: Double)

  case class SessionOut(
      user_id: Long, session_start: Long, n_events: Long, sum_value: Double)

  /** Streaming sessionization via `flatMapGroupsWithState`: one state
    * object per user (the *open* session only — closed sessions are
    * emitted and forgotten, so state is O(users), not O(events)). An
    * event-time timeout set to `last + gap` closes idle sessions once the
    * watermark passes them — the streaming twin of the batch
    * lag/cumsum formulation, with identical session boundaries. */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent])
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._

    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.start, s.n, s.sum))
          } else {
            val sorted = evs.toArray.sortBy(e => (micros(e.ts), e.value))
            val closed = Vector.newBuilder[SessionOut]
            var open = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - s.last <= SessionGapMicros =>
                  open = Some(s.copy(last = t, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, s.start, s.n, s.sum)
                  open = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.last + SessionGapMicros) / 1000 + 1)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming sessionization over a json file-source directory. */
  def sessionStream(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import spark.implicits._
    sessionize(
      spark.readStream
        .schema(eventSchema)
        .option("timestampFormat", TsFormat)
        .json(dir)
        .select(col("user_id"), col("ts"), col("value"))
        .as[SessionEvent])
  }
}
