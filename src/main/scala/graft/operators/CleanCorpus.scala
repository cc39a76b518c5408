package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composed pipeline a training-data
  * ingest runs before embedding (SURVEY §2 suites joined up): keep
  * documents that (a) score above a quality threshold, (b) are predicted
  * English, and (c) are not the duplicate side of a near-dup pair.
  *
  * Shape at scale: quality + langid are computed in ONE codegen'd scan
  * (not joins of the individual queries — the per-doc stats share the
  * tokenization); the only shuffles are the shingle bucketing inherited
  * from the jaccard dedup and the anti-join against the duplicate-id
  * list. That join is deliberately UNHINTED: the duplicate-id list is
  * sized by corpus duplication — tiny on a diverse corpus (AQE broadcasts
  * it from its measured size), potentially corpus-scale on the
  * duplicate-heavy corpora cleaning targets, where a forced broadcast
  * would OOM the driver. */
object CleanCorpus {

  def clean(
      spark: SparkSession,
      sfDir: String,
      minQuality: Double = 0.5): DataFrame = {
    val markers = TextAnalysis.langMarkers.toMap
    def arr(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("array(", ", ", ")")
    val stop = arr(Seq("the", "a", "and", "of", "to", "in", "is", "it"))

    val scored = Tables.documents(spark, sfDir)
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .withColumn("n_stop",
        expr(s"size(filter(toks, t -> array_contains($stop, t)))"))
      .withColumn("quality",
        TextAnalysis.round4(
          lit(0.5) * least(lit(1.0), size(col("toks")) / lit(60.0)) +
          lit(0.3) * (lit(1.0) - col("n_stop") / size(col("toks"))) +
          lit(0.2) * least(lit(1.0),
            (length(col("text")) / size(col("toks"))) / lit(8.0))))
      .withColumn("c_en",
        expr(s"size(filter(toks, t -> array_contains(${arr(markers("en"))}, t)))"))
      .withColumn("c_other", greatest(
        markers.keys.filterNot(_ == "en").toSeq.map(l =>
          expr(s"size(filter(toks, t -> array_contains(${arr(markers(l))}, t)))")): _*))

    // the distinct doc_b side derived from the unique-level pair table —
    // never the member-level expansion (quadratic in copy count; r10)
    val dupIds = Dedup.duplicateDocIds(spark, sfDir)
      .select(col("doc_id"))

    scored
      .where(col("quality") >= minQuality && col("c_en") >= col("c_other"))
      .join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality"))
  }
}
