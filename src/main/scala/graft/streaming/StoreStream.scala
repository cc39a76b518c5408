package graft.streaming

import graft.operators.VectorIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming ingest into the materialized IVF store — the live
  * `add_texts` path: each micro-batch of new/updated vectors is upserted
  * through [[VectorIndex.appendStore]] as its own generation.
  *
  * `foreachBatch` (not a direct file sink) is deliberate: a parquet file
  * sink would write a `_spark_metadata` log that SHADOWS the store's
  * batch-written base files for any batch reader of the same directory;
  * routing the micro-batch through the batch upsert keeps one write path,
  * one layout, and exactly-once-per-generation semantics (the batch id is
  * the generation offset, so a replayed micro-batch overwrites itself
  * idempotently at read time via the max-gen resolution). */
object StoreStream {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", IntegerType),
    StructField("embedding", ArrayType(FloatType))))

  /** `checkpointDir` is required for the idempotence claim above: without
    * a durable checkpoint a restarted stream re-lists the source from
    * scratch with batch ids reset to 0, re-appending old data at fresh
    * generations. */
  def ingest(
      spark: SparkSession,
      dir: String,
      storePath: String,
      startGen: Long,
      checkpointDir: String): StreamingQuery =
    ingestWith(spark, dir, startGen, checkpointDir,
      VectorIndex.appendStore(_, storePath, _, _))

  /** Same live `add_texts` path into the bucket-partitioned LSH store —
    * the store CRUD surface is layout-independent (one shared append
    * implementation), so the streaming ingest is too. */
  def ingestLsh(
      spark: SparkSession,
      dir: String,
      storePath: String,
      startGen: Long,
      checkpointDir: String): StreamingQuery =
    ingestWith(spark, dir, startGen, checkpointDir,
      VectorIndex.appendLshStore(_, storePath, _, _))

  val textSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Live `add_texts` with RAW TEXTS — the reference's actual streaming
    * ingestion contract (texts in, the store embeds internally): each
    * micro-batch of (doc_id, text, lang) rows runs the SAME
    * chunk+featurize transform as batch ingestion
    * ([[graft.operators.TextStore.chunkVectors]]) inside foreachBatch,
    * then upserts through the shared CRUD surface — one transform, one
    * write path, whether the texts arrive by backfill or by stream. */
  def ingestTexts(
      spark: SparkSession,
      dir: String,
      storePath: String,
      startGen: Long,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(textSchema)
      .json(dir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.TextStore.addTexts(
          batch.sparkSession, storePath, batch, startGen + batchId)
      }
      .start()

  private def ingestWith(
      spark: SparkSession,
      dir: String,
      startGen: Long,
      checkpointDir: String,
      append: (SparkSession, DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(vecSchema)
      .json(dir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch.sparkSession, batch, startGen + batchId)
      }
      .start()
}
