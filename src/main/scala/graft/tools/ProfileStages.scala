package graft.tools
import graft.{GraftSession, SparkEntry}

/** Sequence harness: run the named queries in order in one session,
  * timing each — for diagnosing cross-query session effects that
  * single-query Profile can't see.
  * Usage: runMain graft.tools.ProfileStages <sfDir> <query> [query...] */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(16)
    names.foreach { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[profile] $name FAILED: $e") }
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
