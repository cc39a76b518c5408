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
  * one layout, and exactly-once-per-generation semantics.
  *
  * CRASH IDEMPOTENCY (shared with [[CorpusStream.ingestBatch]]):
  * foreachBatch replays a batchId after a crash between the store append
  * and the checkpoint commit, and the store append is `mode("append")` —
  * without a receipt a replay double-appends the same physical rows at
  * the same gen. Every path below therefore probes
  * [[VectorIndex.genExists]] (gen-presence of APPEND rows in the delta)
  * before appending, making a replayed micro-batch a byte-level no-op.
  * The receipt identifies a batch by its gen alone, so the gen namespace
  * must be collision-free: `startGen` defaults to
  * [[VectorIndex.nextGen]] (max gen over base + delta, +1) resolved at
  * stream start — a fresh checkpoint dir resets batchIds to 0, and a
  * constant startGen would collide with gens a previous stream
  * incarnation or batch appends/deletes already wrote, silently dropping
  * the new batches. The store must stay single-writer while a stream
  * runs. Replay idempotency on both layouts and the texts path is pinned
  * by StoreStreamReplaySpec. */
object StoreStream {

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("label", IntegerType),
    StructField("embedding", ArrayType(FloatType))))

  /** Sentinel: resolve startGen from the store at stream start. */
  final val AutoGen: Long = Long.MinValue

  /** The stream's base generation, DURABLY: gen-of-batchId is
    * `base + batchId`, and the replay receipt ([[VectorIndex.genExists]])
    * identifies a batch by its gen alone — so `base` must be stable
    * across restarts of the same checkpoint. Re-deriving nextGen on
    * restart would be unsound in exactly the window the receipt closes:
    * a crash AFTER an append commits but BEFORE the checkpoint commit
    * leaves that orphaned gen in the delta, a re-derived nextGen starts
    * above it, the replayed batchId maps to a FRESH gen, the receipt
    * sees nothing there, and the rows double-append. So the resolution
    * runs once per checkpoint lifetime: first start resolves (AutoGen →
    * nextGen over base+delta; an explicit startGen → as given) and
    * records the base under `<checkpointDir>/graft_base_gen`
    * (write-temp + atomic rename); every restart reads the recorded
    * value — an explicit startGen differing from the marker is ignored
    * in favor of the marker, because changing the mapping mid-checkpoint
    * is precisely the unsound thing. A wiped checkpoint dir loses the
    * marker and the batchId sequence TOGETHER, which is the documented
    * re-ingest-from-scratch semantics (and a fresh nextGen then lands
    * above every committed gen — no collision). Crash windows around the
    * marker itself are safe: it is written at stream start, before any
    * batch runs, and a re-resolution after a crash-before-rename sees an
    * unchanged store. */
  private[graft] def durableStartGen(
      spark: SparkSession, storePath: String, checkpointDir: String,
      startGen: Long): Long = {
    val dir = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dir, "graft_base_gen")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } else {
      val base =
        if (startGen == AutoGen) VectorIndex.nextGen(spark, storePath)
        else startGen
      fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, "graft_base_gen.tmp")
      val out = fs.create(tmp, true)
      try out.write(base.toString.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, marker))
        throw new java.io.IOException(
          s"could not commit base-gen marker $marker (concurrent stream " +
            "start against the same checkpoint?)")
      base
    }
  }

  /** One micro-batch of vector ingest, idempotent per generation — the
    * foreachBatch body, extracted so the replay spec can drive the exact
    * crash-window path. The batch is persisted across the emptiness
    * probe and the append (foreachBatch sources re-scan per action
    * otherwise); an empty batch appends nothing and stays replayable. */
  private[graft] def ingestVecBatch(
      spark: SparkSession, storePath: String, batch: DataFrame, gen: Long,
      append: (SparkSession, DataFrame, Long) => Unit): Unit =
    if (!VectorIndex.genExists(spark, storePath, gen)) {
      val src = batch.persist()
      try { if (!src.isEmpty) append(spark, src, gen) }
      finally src.unpersist()
    }

  /** Texts twin of [[ingestVecBatch]] — same receipt, append through
    * [[graft.operators.TextStore.addTexts]] (chunk + featurize + upsert). */
  private[graft] def ingestTextBatch(
      spark: SparkSession, storePath: String, batch: DataFrame,
      gen: Long): Unit =
    if (!VectorIndex.genExists(spark, storePath, gen)) {
      val src = batch.persist()
      try {
        if (!src.isEmpty)
          graft.operators.TextStore.addTexts(spark, storePath, src, gen)
      } finally src.unpersist()
    }

  /** `checkpointDir` is required for the idempotence claim above: without
    * a durable checkpoint a restarted stream re-lists the source from
    * scratch, re-ingesting old data (the receipt only dedups gens the
    * SAME incarnation wrote — with AutoGen a fresh incarnation starts
    * above them). */
  def ingest(
      spark: SparkSession,
      dir: String,
      storePath: String,
      checkpointDir: String,
      startGen: Long = AutoGen): StreamingQuery =
    ingestWith(spark, dir, storePath, startGen, checkpointDir,
      VectorIndex.appendStore(_, storePath, _, _))

  /** Same live `add_texts` path into the bucket-partitioned LSH store —
    * the store CRUD surface is layout-independent (one shared append
    * implementation), so the streaming ingest is too. */
  def ingestLsh(
      spark: SparkSession,
      dir: String,
      storePath: String,
      checkpointDir: String,
      startGen: Long = AutoGen): StreamingQuery =
    ingestWith(spark, dir, storePath, startGen, checkpointDir,
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
      checkpointDir: String,
      startGen: Long = AutoGen): StreamingQuery = {
    val base = durableStartGen(spark, storePath, checkpointDir, startGen)
    spark.readStream
      .schema(textSchema)
      .json(dir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestTextBatch(batch.sparkSession, storePath, batch, base + batchId)
      }
      .start()
  }

  private def ingestWith(
      spark: SparkSession,
      dir: String,
      storePath: String,
      startGen: Long,
      checkpointDir: String,
      append: (SparkSession, DataFrame, Long) => Unit): StreamingQuery = {
    val base = durableStartGen(spark, storePath, checkpointDir, startGen)
    spark.readStream
      .schema(vecSchema)
      .json(dir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestVecBatch(batch.sparkSession, storePath, batch,
          base + batchId, append)
      }
      .start()
  }
}
