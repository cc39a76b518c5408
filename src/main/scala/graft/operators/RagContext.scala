package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RAG context assembly (the reference's `generate_summary`,
  * /root/reference/app.py:74-91): take the top-3 hits of the similarity
  * search, join to the documents table, and concatenate their texts with
  * a blank line — the prompt context handed to the LLM. The LLM call itself
  * is an external service in the reference and is out of engine scope.
  *
  * Scale shape: the top-k result is k rows → broadcast to the documents
  * join; the concat is a single-group aggregate over k rows.
  */
object RagContext {
  def context(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    assemble(spark, sfDir,
      KnnSearch.topK(spark, sfDir, KnnSearch.Cosine, k = k)
        .select(col("vec_id").as("doc_id"), col("score")))

  /** End-to-end in-pipeline variant: retrieval by the hashing-trick text
    * featurizer ([[TextAnalysis.textSearch]]) instead of the stored
    * embeddings — the full text → vector → search → context path with no
    * external embedder. */
  def contextFromText(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame =
    assemble(spark, sfDir, TextAnalysis.textSearch(spark, sfDir, k = k))

  private def assemble(
      spark: SparkSession, sfDir: String, top: DataFrame): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    broadcast(top)
      .join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("score"), col("text"))
      .groupBy(lit(0).as("query_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            // sort by (-score, doc_id) = best-first, deterministic on ties
            array_sort(collect_list(struct(
              (-col("score")).as("neg_score"),
              col("doc_id").as("vid"),
              col("text").as("text")))),
            x => x.getField("text")),
          "\n\n").as("context"))
  }
}
