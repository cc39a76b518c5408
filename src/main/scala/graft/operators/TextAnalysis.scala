package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline over `documents`
  * (the corpus the reference's vector store indexes; /root/reference/app.py
  * stores `(id, text, metadata)` rows — these ops are the corpus-side QA a
  * 100 TB ingest needs before embedding).
  *
  * All map-only: one codegen'd pass per document, no shuffle. Formulas are
  * expressed with built-in higher-order functions (codegen'd) so they are
  * reproducible 1:1 in the DuckDB oracle.
  */
object TextAnalysis {

  /** Token counts: whitespace tokens, punctuation-aware alnum tokens,
    * distinct alnum tokens. */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_tokens"),
      size(array_distinct(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")))
        .as("n_uniq_tokens"))
      .orderBy("doc_id")

  private val stopwords =
    Seq("the", "a", "and", "of", "to", "in", "is", "it")
  private def stopwordSql =
    stopwords.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** 4-dp rounding as explicit double ops: `floor(x·10⁴ + 0.5) / 10⁴`.
    * Spark's `round` goes through BigDecimal on the shortest decimal
    * representation while DuckDB's multiplies in binary double — for raw
    * values a hair below a half boundary (0.48124999999999996·10⁴ snaps to
    * exactly 4812.5) the two disagree. Spelling the rounding out as the same
    * IEEE ops on both sides makes the engines bit-identical by construction. */
  private[graft] def round4(c: Column): Column =
    floor(c * lit(10000) + lit(0.5)) / lit(10000.0)

  /** Quality score: length, mean token length, stopword ratio →
    * weighted score in [0,1]. The exact formula is arbitrary but fixed;
    * the DuckDB oracle reproduces it term for term. */
  def quality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        size(expr(s"filter(toks, t -> array_contains($stopwordSql, t))")))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        col("n_tokens"),
        round4(col("n_stop") / col("n_tokens")).as("stop_ratio"),
        round4(
          lit(0.5) * least(lit(1.0), col("n_tokens") / lit(60.0)) +
          lit(0.3) * (lit(1.0) - col("n_stop") / col("n_tokens")) +
          lit(0.2) * least(lit(1.0),
            (length(col("text")) / col("n_tokens")) / lit(8.0)))
          .as("quality"))
      .orderBy("doc_id")

  /** Stopword-marker language ID. Scores each candidate language by marker
    * hits and takes the argmax (fixed en>de>fr>es>zh tie order). Determinism,
    * not linguistic accuracy, is the contract — the corpus is synthetic. */
  private[graft] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "small", "big"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("shi", "bu", "wo", "ni", "hao"))

  def langid(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
    val scored = langMarkers.foldLeft(base) { case (df, (lang, markers)) =>
      val arr = markers.map(w => s"'$w'").mkString("array(", ", ", ")")
      df.withColumn(s"c_$lang",
        size(expr(s"filter(toks, t -> array_contains($arr, t))")))
    }
    val langs = langMarkers.map(_._1)
    // first max in fixed order = deterministic argmax
    val pred = langs.tail.foldLeft(
      when(langs.tail.map(l => col("c_en") >= col(s"c_$l")).reduce(_ && _), "en")) {
      case (acc, lang) =>
        val others = langs.filterNot(_ == lang)
        acc.when(others.map(o => col(s"c_$lang") >= col(s"c_$o"))
          .reduce(_ && _), lang)
    }
    scored.select(
      col("doc_id") +: langs.map(l => col(s"c_$l")) :+ pred.as("pred_lang"): _*)
      .orderBy("doc_id")
  }

  /** 61-bit polynomial rolling-hash fingerprint per document (native
    * codegen expression; one scan, no shuffle). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      TextFunctions.polyFingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  /** Hashing-trick text featurizer — the deterministic stand-in for the
    * reference's query-embedding stage (app.py:118 embeds the query text
    * before searching; an LLM featurizer is out of engine scope, a
    * feature-hashing one is not). Each token's 61-bit polynomial hash
    * picks a bucket (`hash mod dim`) and a ±1 sign (bit 6), signed counts
    * sum per bucket, and the per-document L2 normalization makes the
    * output directly consumable by the cosine search operators — closing
    * the text → vector → search path inside the pipeline. Output is the
    * sparse (doc_id, dim, weight, unit_weight) layout; integer weights
    * keep the oracle comparison exact, and the normalized column uses the
    * explicit-floor 4-dp rounding shared with the oracle.
    *
    * Scale shape: one codegen'd scan + explode, one partial-aggregated
    * shuffle keyed by (doc_id, dim), and a doc-keyed window for the norm —
    * the same key prefix, so no extra exchange. */
  def featurize(spark: SparkSession, sfDir: String, dim: Int = 64): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
      .withColumn("h", TextFunctions.polyFingerprint(col("t")))
      .groupBy(
        col("doc_id"),
        pmod(col("h"), lit(dim)).cast("int").as("dim"))
      .agg(sum(when(expr(s"(h div $dim) % 2") === 0, 1).otherwise(-1))
        .as("weight"))
      .withColumn("nrm",
        sqrt(sum(col("weight") * col("weight")).over(byDoc)))
      .select(col("doc_id"), col("dim"), col("weight"),
        round4(when(col("nrm") > 0, col("weight") / col("nrm")).otherwise(lit(0.0)))
          .as("unit_weight"))
      .orderBy("doc_id", "dim")
  }

  /** End-to-end text retrieval inside the pipeline: featurize the query
    * text ([[featurize]]'s hashing-trick vector, stood in by document
    * `queryDocId`'s features), then rank the corpus by cosine over the
    * hashed feature space. The numeric core is EXACT-integer: raw signed
    * bucket counts dot-multiply (no float order sensitivity), and the only
    * float ops are one sqrt + one division per document from those exact
    * integers — so the DuckDB oracle is bit-identical by construction.
    *
    * Scale shape: the query's sparse weights are a literal map broadcast
    * in the task closure (query parameter, like the kNN query vector); the
    * corpus side is the featurize aggregation followed by a per-doc dot —
    * one keyed shuffle, no join against the query. */
  def textSearch(
      spark: SparkSession,
      sfDir: String,
      k: Int = 10,
      queryDocId: Long = 0L,
      dim: Int = 64): DataFrame = {
    val w = featurize(spark, sfDir, dim)
    val qRows = w.where(col("doc_id") === queryDocId)
      .select(col("dim"), col("weight")).collect()
    val qw: Map[Int, Long] = qRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val qNorm2: Long = qw.values.map(v => v * v).sum
    val qwCol = typedLit(qw)
    w.where(col("doc_id") =!= queryDocId)
      .groupBy(col("doc_id"))
      .agg(
        sum(col("weight") * coalesce(element_at(qwCol, col("dim")), lit(0L)))
          .as("dot"),
        sum(col("weight") * col("weight")).as("norm2"))
      .select(col("doc_id"),
        round4(col("dot") /
          sqrt(col("norm2").cast("double") * lit(qNorm2.toDouble)))
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
