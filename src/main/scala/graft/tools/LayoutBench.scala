package graft.tools

import graft.{Bench, GraftSession, SparkEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Join-family layout A/B (r16, VERDICT r15 item 3): measures the TPC-H
  * join family (q3/q5/q9/q18 — the largest sf100 wall-time block and the
  * widest variance band) against TWO physical layouts of the same data
  * in ONE window:
  *   - `plain`: the flat parquet files, exactly as every sweep reads them;
  *   - `bucketed`: lineitem and orders written
  *     `bucketBy(N, orderkey).sortBy(orderkey)` into a catalog database,
  *     picked up via the `spark.graft.bucketed.db` redirect in
  *     [[graft.Tables]] — the lineitem⋈orders join and every
  *     orderkey-keyed aggregate then run with no exchange on that key.
  * At 100 TB this is the difference between shuffling the two largest
  * fact tables per query and a storage-aligned join; the A/B prices it
  * on this host so the layout is adopted (or declined) on a measurement.
  *
  * Discipline: both arms sampled per query per pass, min-of-2 across
  * passes, query order reversed and arm order swapped on the even pass
  * (same position-bias reasoning as graft.Bench); cache cleared between
  * samples; one JSON line with both arms, the bucketed build cost, the
  * per-arm final-plan exchange counts (mechanical evidence the layout
  * removed the shuffles, not just that the clock moved), and the
  * calibration block.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BUCKETS
  * (default 32), SPARK_GRAFT_ONLY (defaults to the join family). */
object LayoutBench {
  private val DefaultFamily =
    Seq("q3_join", "q5_join", "q9_profit", "q18_big_orders")
  private val Db = "graft_bl"

  private def runOnce(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultFamily)
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: $unknown")
    val spark = GraftSession.local(cpus)
    val calibPre = Bench.calibrate(spark, sfDir)

    // ---- build the bucketed replica (timed: it is the layout's price,
    // paid once per corpus — the number the adoption decision weighs
    // against the per-query win) ----
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db")
    val t0Build = System.nanoTime()
    for ((t, key) <- Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey")) {
      spark.sql(s"DROP TABLE IF EXISTS $Db.$t")
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.bucketBy(buckets, key).sortBy(key)
        .mode("overwrite").saveAsTable(s"$Db.$t")
    }
    val buildSec = (System.nanoTime() - t0Build) / 1e9

    def withArm[A](arm: String)(body: => A): A = {
      if (arm == "bucketed") spark.conf.set("spark.graft.bucketed.db", Db)
      else spark.conf.unset("spark.graft.bucketed.db")
      try body finally spark.conf.unset("spark.graft.bucketed.db")
    }

    // ---- mechanical plan evidence: exchanges in the FINAL adaptive plan
    // per arm (untimed; collect drives AQE to the executed shape) ----
    def exchanges(name: String, arm: String): Int = withArm(arm) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      // SHUFFLE exchanges only: `\b` keeps BroadcastExchange and
      // ReusedExchange out of the count (a bucketed arm that converts a
      // shuffle join to broadcast would otherwise show no delta), and
      // the partitioning keyword pins the match to the shuffle forms
      """\bExchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobin)""".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    }
    val planCounts = names.map { n =>
      spark.catalog.clearCache()
      n -> (exchanges(n, "plain"), exchanges(n, "bucketed"))
    }.toMap

    // ---- the timed A/B ----
    val times = scala.collection.mutable.Map.empty[(String, String), Double]
    def sample(name: String, arm: String): Unit = withArm(arm) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      runOnce(SparkEntry.queries(name)(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      val k = (name, arm)
      times(k) = math.min(times.getOrElse(k, Double.MaxValue), dt)
    }
    for (pass <- 1 to 2) {
      val order = if (pass % 2 == 0) names.reverse else names
      val arms = if (pass % 2 == 0) Seq("bucketed", "plain")
                 else Seq("plain", "bucketed")
      for (n <- order; a <- arms) sample(n, a)
    }

    val calibPost = Bench.calibrate(spark, sfDir)
    import java.util.Locale
    def s4(v: Double): String =
      String.format(Locale.ROOT, "%.4f", Double.box(v))
    def fmtCal(m: Map[String, Double]): String =
      m.toSeq.sorted.map { case (k, v) => "\"" + k + "\":" + s4(v) }
        .mkString("{", ",", "}")
    val qs = names.map { n =>
      val (ep, eb) = planCounts(n)
      "\"" + n + "\":{\"plain\":" + s4(times((n, "plain"))) +
        ",\"bucketed\":" + s4(times((n, "bucketed"))) +
        s""","exchanges_plain":$ep,"exchanges_bucketed":$eb}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"layout_ab","unit":"sec","buckets":$buckets,"build_sec":${s4(buildSec)},"queries":$qs,"calibration":{"pre":${fmtCal(calibPre)},"post":${fmtCal(calibPost)}},"sf":"$sfDir"}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_last.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
