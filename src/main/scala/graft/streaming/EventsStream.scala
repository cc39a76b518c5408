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

  // --- live funnel qualification -------------------------------------------

  case class FunnelEvent(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long, event_type: String)

  /** Per-user funnel progress: which steps has this user completed.
    * Three booleans per user — state is O(users), monotone (flags only
    * ever turn on), so it never needs timeout-based eviction to stay
    * bounded. */
  case class FunnelState(view: Boolean, click: Boolean, purchase: Boolean)

  case class FunnelOut(user_id: Long, s1: Int, s2: Int, s3: Int)

  /** Streaming twin of `Analytics.eventsFunnel`'s per-user qualification:
    * a `mapGroupsWithState` state machine — view arms the click step,
    * a qualified click arms the purchase step. Events are ordered by
    * (ts, event_id) WITHIN each micro-batch, so under in-event-time-order
    * delivery the state machine matches the batch window formulation
    * exactly (spec-asserted). Under late arrival the stream is the live
    * approximation and the batch operator is the backfill truth — the
    * same lambda-architecture contract as the windowed aggregation. */
  def funnel(events: org.apache.spark.sql.Dataset[FunnelEvent])
      : org.apache.spark.sql.Dataset[FunnelOut] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._

    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(false, false, false))
          evs.toArray.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            e.event_type match {
              case "view" => st = st.copy(view = true)
              case "click" if st.view => st = st.copy(click = true)
              case "purchase" if st.click => st = st.copy(purchase = true)
              case _ => ()
            }
          }
          state.update(st)
          FunnelOut(uid, if (st.view) 1 else 0, if (st.click) 1 else 0,
            if (st.purchase) 1 else 0)
      }
  }

  def funnelStream(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[FunnelOut] = {
    import spark.implicits._
    funnel(
      spark.readStream
        .schema(eventSchema)
        .option("timestampFormat", TsFormat)
        .json(dir)
        .where(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .as[FunnelEvent])
  }
}
