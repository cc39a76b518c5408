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

  test("mapGroupsWithState funnel matches the batch funnel counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_funnel").toString

    // stage the funnel events in three event-time-ordered files so the
    // state machine crosses micro-batch boundaries (maxFilesPerTrigger=1)
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    // stamp each stage's files with explicitly increasing mod times —
    // the file source orders by mtime, and relying on wall-clock write
    // spacing would make micro-batch order timing-dependent
    val stamped = scala.collection.mutable.Set.empty[java.io.File]
    val baseMs = 1700000000000L
    Seq(
      ev.where(col("ts") <= to_timestamp(lit("2024-01-10"))),
      ev.where(col("ts") > to_timestamp(lit("2024-01-10")) &&
        col("ts") <= to_timestamp(lit("2024-01-20"))),
      ev.where(col("ts") > to_timestamp(lit("2024-01-20"))))
      .zipWithIndex.foreach { case (part, i) =>
        part.coalesce(1).write
          .option("timestampFormat", EventsStream.TsFormat)
          .mode(if (i == 0) "overwrite" else "append").json(dir)
        new java.io.File(dir).listFiles()
          .filter(f => f.getName.endsWith(".json") && !stamped(f))
          .foreach { f =>
            assert(f.setLastModified(baseMs + i * 60000L))
            stamped += f
          }
      }

    val q = spark.readStream.schema(EventsStream.eventSchema)
      .option("timestampFormat", EventsStream.TsFormat)
      .option("maxFilesPerTrigger", "1")
      .json(dir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[EventsStream.FunnelEvent]
      .transform(EventsStream.funnel)
      .writeStream.format("memory").queryName("funnel_stream_spec")
      .outputMode("update").start()
    try q.processAllAvailable()
    finally q.stop()

    // flags are monotone: the user's final state is the max over updates
    val streamed = spark.table("funnel_stream_spec")
      .groupBy(col("user_id"))
      .agg(max(col("s1")).as("s1"), max(col("s2")).as("s2"),
        max(col("s3")).as("s3"))
      .agg(count(lit(1)), sum(col("s1")), sum(col("s2")), sum(col("s3")))
      .collect().head
    val batchRow = Analytics.eventsFunnel(spark, sfDir).collect().head
    assert(streamed.getLong(0) == batchRow.getLong(0))
    assert(streamed.getLong(1) == batchRow.getLong(1))
    assert(streamed.getLong(2) == batchRow.getLong(2))
    assert(streamed.getLong(3) == batchRow.getLong(3))
  }
}
