package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The as-of join's window formulation (one shuffle, running last()) must
  * agree row-for-row with the quadratic reference formulation (explicit
  * range join + per-click argmax) — including the tie rules: a purchase at
  * exactly the click's timestamp is visible, and equal-ts purchases
  * resolve to the larger event_id. */
class AsofJoinSpec extends SparkSpec {

  test("NTZ events read fails loudly under a non-UTC session timezone") {
    // the NTZ→LTZ cast is value-identical to the naive wall time ONLY
    // under UTC; a library caller with an unpinned session must get the
    // loud layout error, never silently shifted timestamps
    import org.apache.spark.sql.types.TimestampNTZType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val landedNtz = spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType == TimestampNTZType
    assume(landedNtz, "driver generation no longer ships NTZ events")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalStateException](Tables.events(spark, sfDir))
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("window formulation matches the explicit argmax join") {
    // operator output is unordered by design (hash-time sort lives in
    // SparkEntry.hashOrder); pin the compare order here
    val out = Analytics.eventsAsof(spark, sfDir).orderBy(col("click_id"))

    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id").as("pu"),
        col("ts").as("pts"), col("value").as("pval"))
    val w = Window.partitionBy(col("click_id"))
      .orderBy(col("pts").desc_nulls_last, col("p_event_id").desc_nulls_last)
    val ref = clicks
      .join(purchases, col("pu") === col("cu") && col("pts") <= col("cts"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("click_id"), col("cu").as("user_id"),
        unix_micros(col("cts")).as("ts_us"),
        col("p_event_id"), unix_micros(col("pts")).as("p_ts_us"),
        round(col("pval"), 2).as("p_value"),
        (unix_micros(col("cts")) - unix_micros(col("pts"))).as("gap_us"))
      .orderBy(col("click_id"))

    assert(out.columns.toSeq == ref.columns.toSeq)
    assert(out.collect().toSeq == ref.collect().toSeq)
  }

  test("every click row survives; matched rows have non-negative gaps") {
    val rows = Analytics.eventsAsof(spark, sfDir).collect()
    val nClicks = Tables.events(spark, sfDir)
      .where(col("event_type") === "click").count()
    assert(rows.length == nClicks)
    rows.foreach { r =>
      val gapIdx = r.fieldIndex("gap_us")
      if (!r.isNullAt(gapIdx)) assert(r.getLong(gapIdx) >= 0L)
      // matched purchase columns are all-or-nothing
      assert(r.isNullAt(r.fieldIndex("p_event_id")) == r.isNullAt(gapIdx))
    }
  }

  test("the plan joins nothing — one window over one shuffle") {
    val plan = Analytics.eventsAsof(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
  }
}
