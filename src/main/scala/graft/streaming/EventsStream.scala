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

  /** File-source stream over a directory of event files (json lines),
    * 10-minute watermark, windowed aggregation. */
  def stream(spark: SparkSession, dir: String): DataFrame =
    windowAgg(
      spark.readStream
        .schema(eventSchema)
        .json(dir)
        .withWatermark("ts", "10 minutes"))
}
