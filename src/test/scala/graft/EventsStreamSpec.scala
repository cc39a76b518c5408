package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EventsStreamSpec extends SparkSpec {

  test("streaming windowed agg matches the batch plan on the same events") {
    // stage the batch events table as a json file-source directory
    val dir = Files.createTempDirectory("events_stream").toString
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.option("timestampFormat", EventsStream.TsFormat)
      .mode("overwrite").json(dir)

    val q = EventsStream.stream(spark, dir)
      .writeStream
      .format("memory")
      .queryName("events_stream_spec")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("events_stream_spec")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventsStream.windowAgg(Tables.events(spark, sfDir))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
