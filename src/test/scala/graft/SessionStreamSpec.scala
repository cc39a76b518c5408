package graft

import graft.operators.Analytics
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SessionStreamSpec extends SparkSpec {

  test("flatMapGroupsWithState sessionization matches batch sessionize") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_sessions").toString

    // batch ground truth on the same events
    val batch = Analytics.sessionize(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

    // stage the events, then a far-future sentinel event that advances the
    // watermark past every open session's timeout so they all close
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.option("timestampFormat", EventsStream.TsFormat).mode("overwrite").json(dir)
    val maxTs = Tables.events(spark, sfDir).agg(max("ts")).head()
      .getTimestamp(0).toInstant
    Seq((-1L, java.sql.Timestamp.from(maxTs.plusSeconds(86400)), -1L, "x", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.option("timestampFormat", EventsStream.TsFormat).mode("append").json(dir)

    val q = EventsStream.sessionStream(spark, dir)
      .writeStream.format("memory").queryName("session_stream_spec")
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("session_stream_spec")
      .where(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
      .toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }
}
