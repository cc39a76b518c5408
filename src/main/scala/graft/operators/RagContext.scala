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
  def context(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val top = KnnSearch.topK(spark, sfDir, KnnSearch.Cosine, k = k)
    val docs = Tables.documents(spark, sfDir)
    broadcast(top)
      .join(docs, top("vec_id") === docs("doc_id"))
      .select(col("vec_id"), col("score"), col("text"))
      .groupBy(lit(0).as("query_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        array_join(
          transform(
            // sort by (-score, vec_id) = best-first, deterministic on ties
            array_sort(collect_list(struct(
              (-col("score")).as("neg_score"),
              col("vec_id").as("vid"),
              col("text").as("text")))),
            x => x.getField("text")),
          "\n\n").as("context"))
  }
}
