package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line.
  *
  * Measurement discipline (this host is a noisy-neighbor VM with
  * multi-second CPU-steal bursts; a single sample can be 5-50× steady
  * state):
  *   - the action is a write to the `noop` sink, which executes the FULL
  *     plan including final sorts (a bare `count()` lets Catalyst drop
  *     order-by stages and under-measures);
  *   - every query runs twice (pass 1 also pays Janino/JIT warmup) and the
  *     min is kept;
  *   - an outlier-retry pass then re-runs any query whose min is still
  *     > 5× the median of the other mins — a steal burst that hit both
  *     passes of one query would otherwise report as engine time;
  *   - failures are NOT swallowed: a crashed query reports `"failed"` and
  *     is excluded from the total rather than masquerading as a fast run.
  */
object Bench {
  private def runOnce(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    // opt-out knob for sweep variants (e.g. the declared-quadratic
    // dedup_embedding at sf1, where it alone is ~55% of wall time and its
    // sub-quadratic sibling is benched anyway)
    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // include-list knob for family-targeted large-SF sweeps (a 30-query
    // sf10 rehearsal would otherwise need the 60-query complement spelled
    // out as SKIP); unknown names fail loudly instead of silently
    // shrinking the sweep
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: $unknown")
    val spark = GraftSession.local(cpus)
    val base = if (only.nonEmpty) only else SparkEntry.queries.keySet
    val names = (base -- skip).toSeq.sorted
    val times = scala.collection.mutable.Map.empty[String, Double]
    val failed = scala.collection.mutable.Set.empty[String]

    def sample(name: String): Unit = {
      // isolate samples: a query that persists intermediate state (e.g.
      // minhash signatures) must not hand later passes a cache hit that
      // understates its steady-state cost
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        runOnce(SparkEntry.queries(name)(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = math.min(times.getOrElse(name, Double.MaxValue), dt)
        failed -= name // a success anywhere outranks a transient failure
      } catch {
        case e: Throwable =>
          // a query with a valid measured time stays measured — one flaky
          // sample (steal-burst OOM, etc.) must not erase a real result
          if (!times.contains(name)) failed += name
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
      }
    }

    // SPARK_GRAFT_PASSES=1 halves a multi-hour large-SF sweep at the cost
    // of including first-touch JIT/Janino warmup in each sample — use it
    // only where the per-query work dwarfs warmup (sf≥100 full-surface
    // sweeps); the default 2-pass min stays the small-SF discipline
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    for (pass_ <- 1 to passes; name <- names) {
      if (pass_ == 2 && name == names.head) { System.gc(); Thread.sleep(1000) }
      sample(name)
    }
    // outlier-retry: a query whose min is far above the pack's median was
    // likely hit by a steal burst in both passes — re-measure it (twice).
    // SPARK_GRAFT_NO_RETRY opts out for large-SF sweeps, where the heavy
    // tail (output-bound dedup pairs, the real-decode seam) is genuinely
    // minutes above the median and a retry only re-runs a real cost.
    val ok = names.filterNot(failed)
    if (ok.size >= 4 && !sys.env.contains("SPARK_GRAFT_NO_RETRY")) {
      val sorted = ok.map(times).sorted
      val median = sorted(sorted.size / 2)
      val outliers = ok.filter(n => times(n) > math.max(5 * median, 5.0))
      for (n <- outliers) { sample(n); sample(n) }
    }

    // "queries" stays numeric-only (downstream parsers expect seconds);
    // failed queries are omitted there and listed under "failed" instead.
    // Seconds print at 4dp: full double digits made the line long enough
    // that a tail-truncating log capture lost the head of the map (the
    // r5 artifact dropped its first ~9 queries); 0.1 ms resolution is
    // far below this host's noise floor anyway.
    // Locale.ROOT: the f-interpolator uses the JVM default locale, and a
    // comma decimal separator (de_DE, fr_FR, ...) would make the JSON
    // unparseable
    def s4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = names.filterNot(failed)
      .map(n => "\"" + n + "\":" + s4(times(n))).mkString("{", ",", "}")
    val total = names.filterNot(failed).map(times).sum
    val failedJson = failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // self-describing partial sweeps: a skipped query is a deliberate gap,
    // not a fast run — without this a SPARK_GRAFT_SKIP sweep's total is
    // indistinguishable from a full run except by missing keys
    val skippedJson = (SparkEntry.queries.keySet -- names).toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${s4(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"skipped":$skippedJson,"sf":"$sfDir"}"""
    println(line)
    // belt-and-braces copy for log-capture truncation: the same line, as
    // a file next to the run
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_last.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
