package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key has a matching `oracleSql` entry (DuckDB SQL over the
  * same parquet tables) unless the operator is not SQL-expressible, in which
  * case the driver records a rows-only check. Column names and rounding are
  * aligned on both sides — the driver hash-compares values after sorting
  * columns by name.
  */
object SparkEntry {

  /** Flagship query (the reference's search endpoint, app.py:124): exact
    * top-k cosine similarity with scores. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    KnnSearch.topK(spark, "/root/testdata/sf0.001", KnnSearch.Cosine)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- vector search (SURVEY §2: reference core) ---
    "knn_cosine" -> ((s, d) => KnnSearch.topK(s, d, KnnSearch.Cosine)),
    "knn_dot" -> ((s, d) => KnnSearch.topK(s, d, KnnSearch.InnerProduct)),
    "knn_l2" -> ((s, d) => KnnSearch.topK(s, d, KnnSearch.Euclidean)),
    "knn_filtered" -> ((s, d) =>
      KnnSearch.topK(s, d, KnnSearch.Cosine,
        filter = Some(org.apache.spark.sql.functions.col("label") === 3))),
    "knn_threshold" -> ((s, d) => KnnSearch.aboveThreshold(s, d, 0.2)),
    "knn_batch" -> ((s, d) => KnnSearch.batchTopK(s, d)),
    "vec_normalize" -> ((s, d) => KnnSearch.normalizedStore(s, d)),
    "store_stats" -> ((s, d) => KnnSearch.storeStats(s, d)),
    "rag_context" -> ((s, d) => RagContext.context(s, d)),
    // --- relational analytics ---
    "q1_agg" -> ((s, d) => Analytics.q1(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "knn_cosine" ->
      """SELECT e.vec_id, e.label,
        |  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "knn_dot" ->
      """SELECT e.vec_id, e.label,
        |  ROUND(list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "knn_l2" ->
      """SELECT e.vec_id, e.label,
        |  ROUND(list_distance(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY score ASC, e.vec_id
        |LIMIT 10""".stripMargin,
    "knn_filtered" ->
      """SELECT e.vec_id, e.label,
        |  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
        |FROM embeddings e
        |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0 AND e.label = 3
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,
    "knn_threshold" ->
      """SELECT vec_id, score FROM (
        |  SELECT e.vec_id,
        |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
        |  FROM embeddings e
        |  CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
        |  WHERE e.vec_id <> 0)
        |WHERE score >= 0.2
        |ORDER BY score DESC, vec_id""".stripMargin,
    "knn_batch" ->
      """SELECT query_id, vec_id, score, rank FROM (
        |  SELECT query_id, vec_id, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS INTEGER) AS rank
        |  FROM (
        |    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
        |      ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])), 4) AS score
        |    FROM embeddings e
        |    CROSS JOIN embeddings q
        |    WHERE q.vec_id < 5 AND e.vec_id >= 5))
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "vec_normalize" ->
      """SELECT vec_id, label,
        |  ROUND(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 4) AS norm,
        |  ROUND(1.0, 4) AS unit_norm
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
    "store_stats" ->
      """SELECT count(*) AS n_vectors, count(DISTINCT label) AS n_labels,
        |  CAST(min(len(embedding)) AS INTEGER) AS min_dim,
        |  CAST(max(len(embedding)) AS INTEGER) AS max_dim
        |FROM embeddings""".stripMargin,
    "rag_context" ->
      ("""SELECT 0 AS query_id, count(*) AS n_docs,
        |  string_agg(d.text, '""".stripMargin + "\n\n" +
        """' ORDER BY s.score DESC, s.vec_id) AS context
        |FROM (
        |  SELECT e.vec_id,
        |    ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
        |  FROM embeddings e
        |  CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) q
        |  WHERE e.vec_id <> 0
        |  ORDER BY score DESC, e.vec_id
        |  LIMIT 3) s
        |JOIN documents d ON d.doc_id = s.vec_id""".stripMargin),
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(sum(l_quantity), 2) AS sum_qty,
        |  ROUND(sum(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  ROUND(avg(l_quantity), 4) AS avg_qty,
        |  ROUND(avg(l_extendedprice), 4) AS avg_price,
        |  ROUND(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
