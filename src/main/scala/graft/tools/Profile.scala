package graft.tools
import graft.SparkEntry

/** Ad-hoc profiling main: run one SparkEntry query N times in a warm JVM.
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [--explain]
  * Note: this machine's warm per-job floor is ~0.5s (measured via
  * spark.range sums), so absolute small-SF latencies are overhead-bound;
  * compare plans and job counts, not wall-clock, at sf<=0.01.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("knn_cosine")
    val sfDir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.01")
    // the engine's tuned session (NOT a bare builder): a profile run must
    // measure the plans the graded queries actually get — broadcast
    // policy, AQE, split floors all change them
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    if (args.contains("--explain"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    // --runs=N for expensive large-SF probes where 3 warm runs would
    // triple a multi-minute measurement
    val runs = args.collectFirst { case a if a.startsWith("--runs=") =>
      a.stripPrefix("--runs=").toInt }.getOrElse(3)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
