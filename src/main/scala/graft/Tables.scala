package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Plain `spark.read.parquet` — Catalyst then owns filter/projection
  * pushdown into the scan, which is what makes the full-corpus vector scan
  * viable at 100 TB: a kNN query reads only (id, embedding[, filter cols]).
  */
object Tables {
  /** Opt-in storage-aligned layout redirect (r16, VERDICT r15 item 3):
    * when the session conf `spark.graft.bucketed.db` names a catalog
    * database, any table registered there SHADOWS its parquet file —
    * tables not registered fall through unchanged. The intended use is
    * fact tables written `bucketBy(N, joinKey).sortBy(joinKey)` once
    * (lineitem/orders on the order key): every fact-to-fact join and
    * orderkey-keyed aggregate over them then consumes the layout with NO
    * exchange on the bucketed key, which at 100 TB converts the
    * engine's largest shuffles into storage-aligned local work.
    * Unset (the default everywhere), this is a pure parquet read and
    * Catalyst owns pushdown exactly as before. graft.tools.LayoutBench
    * builds the replica and A/Bs the join family both ways. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val redirected = spark.conf.getOption("spark.graft.bucketed.db")
      .filter(_.nonEmpty)
      .filter(db => spark.catalog.tableExists(s"$db.$name"))
      .map(db => spark.table(s"$db.$name"))
    redirected.getOrElse(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.parquet` has shipped `ts` in two physical layouts across
    * driver generations: TIMESTAMP(NANOS) — which Spark's parquet reader
    * rejects, so it's read as a nanos long (legacy knob) and converted via
    * integer division to micros (exact, no double rounding) — and, since
    * the round-9 regeneration, plain TIMESTAMP(MICROS), which lands as
    * TIMESTAMP_NTZ. Sniff the landed type so both layouts read, and
    * normalize to the TIMESTAMP_LTZ every consumer (unix_micros, the
    * streaming Timestamp encoders) expects — value-identical to the NTZ
    * wall time because every entry point pins the session timezone to
    * UTC, matching the DuckDB oracle's naive read. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) read as nanos-long under the legacy knob — the
      // only way a Long lands here, since no generation ships a plain
      // int64 ts; an exact integer conversion, no double rounding
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        // the NTZ→LTZ cast interprets the wall time in the SESSION
        // timezone — value-identical to the naive reading only under
        // UTC. Every graft entry point pins UTC, but a library caller
        // building their own session might not: fail loudly like the
        // unknown-layout branch below, never shift wall times silently.
        val tz = s.conf.get("spark.sql.session.timeZone")
        if (tz != "UTC") throw new IllegalStateException(
          s"events.ts is TIMESTAMP_NTZ: reading it requires " +
            s"spark.sql.session.timeZone=UTC (got '$tz') — " +
            "see GraftSession for the pinned session configuration")
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case TimestampType => raw
      // anything else is a layout this reader has never seen: fail loudly
      // instead of casting into silent nulls or misscaled timestamps
      case other => throw new IllegalStateException(
        s"events.ts landed as unexpected type $other in $d")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
