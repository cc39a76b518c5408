package graft.streaming

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming batch-kNN: a stream of query vectors against the static
  * vector store — the serving twin of `KnnSearch.batchTopK`.
  *
  * Shape: stream-STATIC join (the store side is a plain table, so no
  * watermark/state is needed for the join itself — each micro-batch of
  * queries joins map-side against the broadcast/scanned store), then the
  * per-query top-k via the same `TopKAgg` partial aggregate the batch
  * plan uses: post-join rows reduce to k per query before the shuffle.
  * State per query is one k-slot heap; results stream out in complete
  * mode keyed by query_id.
  */
object SearchStream {

  val querySchema: StructType = StructType(Seq(
    StructField("query_id", LongType),
    StructField("query_vec", ArrayType(FloatType))))

  /** File-source stream of query vectors, joined against the static store
    * (vec_id ≥ `minCorpusId` mirrors the batch query/corpus split). */
  def stream(
      spark: SparkSession,
      dir: String,
      sfDir: String,
      k: Int = 5,
      minCorpusId: Long = 5L): DataFrame = {
    val corpus = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") >= minCorpusId)
    val queries = spark.readStream
      .schema(querySchema)
      .json(dir)
    val scored = queries
      .join(corpus)
      .select(
        col("query_id"),
        col("vec_id"),
        round(VectorFunctions.cosineSim(col("embedding"), col("query_vec")), 4)
          .as("score"))
    graft.operators.KnnSearch.perQueryTopK(scored, k)
  }
}
