package graft.tools

import graft.GraftSession
import graft.operators.VectorIndex

/** Scratch: isolate where lsh store write/compact time goes. */
object ScratchLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(16)
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def tmp() = java.nio.file.Files.createTempDirectory("graft_scratch_").toString

    // warm up codegen etc.
    val w0 = tmp(); timed("warm_build")(VectorIndex.writeLshStore(spark, sfDir, w0))

    val p1 = tmp()
    timed("lsh_build")(VectorIndex.writeLshStore(spark, sfDir, p1))
    timed("lsh_compact")(VectorIndex.compactLshStore(spark, p1))

    val p2 = tmp()
    timed("ivf_build")(VectorIndex.writeStore(spark, sfDir, p2))
    timed("ivf_compact")(VectorIndex.compactStore(spark, p2))

    val nFiles = new java.io.File(s"$p1/vectors").listFiles()
      .filter(_.isDirectory)
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    println(s"[scratch] lsh dirs=${nFiles.length} files=${nFiles.sum}")

    spark.stop()
  }
}
