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

  /** The per-payload keep verdict — quality score + English-majority test
    * computed in ONE codegen'd token pass (the native MarkerCounts
    * expression langid/quality use: mc[0] = stopword hits, mc[1] = en,
    * mc[2..] = the other languages in langMarkers order) — over any frame
    * with a `text` column. ONE definition shared by the batch pipeline
    * (applied per distinct payload, expanded by id) and the streaming
    * ingest stage (applied per row — a live micro-batch has no dup mass
    * to collapse), so backfill and live ingest provably agree. Stateless:
    * safe in append mode. */
  private[graft] def scoredKeep(df: DataFrame, minQuality: Double): DataFrame = {
    val stop = TextAnalysis.stopwords // the quality replay must count
    // exactly text_quality's list — one definition, not a copy
    val sets: Seq[Seq[String]] = stop +: TextAnalysis.langMarkers.map(_._2)
    df
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .withColumn("mc",
        graft.functions.TextFunctions.markerCounts(col("toks"), sets))
      .withColumn("n_stop", col("mc").getItem(0))
      .withColumn("quality",
        TextAnalysis.round4(
          lit(0.5) * least(lit(1.0), size(col("toks")) / lit(60.0)) +
          lit(0.3) * (lit(1.0) - col("n_stop") / size(col("toks"))) +
          lit(0.2) * least(lit(1.0),
            (length(col("text")) / size(col("toks"))) / lit(8.0))))
      .withColumn("c_en", col("mc").getItem(1))
      .withColumn("c_other", greatest(
        (2 until sets.length).map(i => col("mc").getItem(i)): _*))
      .where(col("quality") >= minQuality && col("c_en") >= col("c_other"))
  }

  def clean(
      spark: SparkSession,
      sfDir: String,
      minQuality: Double = 0.5): DataFrame = {
    // UNIQUE-FIRST over BYTE-identical texts (r12): quality's density
    // term reads the RAW text length, which the dedup normalization
    // folds (two whitespace-variant copies share a normalized unique but
    // differ in length) — so the exact-text table is the sound collapse
    // here, like chunk_search's. Score once per distinct payload, keep
    // the per-unique verdict, expand to members by id, THEN anti-join
    // the duplicate ids (a doc-level decision).
    val uScored = scoredKeep(
      CorpusOps.exactUniqueDocs(spark, sfDir).select(col("uid"), col("text")),
      minQuality)
      .select(col("uid"), col("quality"))

    // the distinct doc_b side derived from the unique-level pair table —
    // never the member-level expansion (quadratic in copy count; r10)
    val dupIds = Dedup.duplicateDocIds(spark, sfDir)
      .select(col("doc_id"))

    CorpusOps.exactUniqueMembers(spark, sfDir)
      .join(uScored, "uid")
      .join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("quality"))
  }
}
