package graft.tools
import graft.{GraftSession, SparkEntry}

/** Index-health dump: run the three ann_eval* queries (IVF, LSH, PQ
  * recall@k vs the exact scan) on one corpus dir and print a single JSON
  * line in the bench/r{N}_ann_eval_* artifact shape, so large-SF recall
  * sweeps are a one-command reproducible record instead of a hand-copied
  * table.
  * Usage: runMain graft.tools.AnnEvalDump [sfDir]
  */
object AnnEvalDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    def s4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // (family key, queries-map name); each returns one row
    // (n_queries, k, mean_recall, min_recall)
    val fams = Seq("ivf" -> "ann_eval", "lsh" -> "ann_eval_lsh",
      "pq" -> "ann_eval_pq")
    var nq, k = -1L
    val parts = fams.map { case (fam, q) =>
      val r = SparkEntry.queries(q)(spark, sfDir).collect().head
      val fnq = r.getLong(r.fieldIndex("n_queries"))
      val fk = r.getAs[Number]("k").longValue()
      // the top-level n_queries/k claim to describe ALL families — a
      // divergence must fail the dump, not be silently last-wins
      require(nq < 0 || (fnq == nq && fk == k),
        s"family $fam reports n_queries=$fnq k=$fk, prior families " +
          s"reported n_queries=$nq k=$k — per-family divergence")
      nq = fnq; k = fk
      s""""$fam":{"mean_recall":${s4(r.getDouble(r.fieldIndex("mean_recall")))},"min_recall":${s4(r.getDouble(r.fieldIndex("min_recall")))}}"""
    }
    println(s"""{"metric":"ann_eval_recall","sf":"$sfDir","n_queries":$nq,"k":$k,"families":{${parts.mkString(",")}}}""")
    spark.stop()
  }
}
