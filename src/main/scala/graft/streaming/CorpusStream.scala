package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming front gate of the corpus-cleaning pipeline: exact dedup over a
  * document stream (the ingest-time twin of the batch `Dedup.exact`).
  *
  * Formulated as a streaming aggregation keyed by the normalized-text hash
  * (`groupBy(text_md5).agg(min(doc_id), count)`), NOT `dropDuplicates`:
  * the running `min` makes the result identical to the batch keep-set
  * regardless of arrival order across micro-batches, which is what makes
  * backfill (batch over history) and live ingest agree. State per executor
  * is one (hash, min, count) row per DISTINCT document — O(corpus
  * cardinality), the same footprint the batch hash-aggregate pays; a
  * production ingest bounds it further with
  * `dropDuplicatesWithinWatermark` on an arrival-time column when exact
  * global dedup is relaxed to a horizon.
  */
object CorpusStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** File-source reader shared by every gate: `maxFilesPerTrigger > 0`
    * bounds each micro-batch to that many input files — production
    * ingest backpressure, and what lets the specs stage a multi-file
    * directory as genuinely SEPARATE micro-batches (without it the
    * source drains the whole directory in one trigger and a cross-batch
    * claim is never exercised). */
  private def fileSource(
      spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int): DataFrame = {
    val r = spark.readStream.schema(schema)
    (if (maxFilesPerTrigger > 0)
       r.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else r).json(dir)
  }

  /** Streaming exact dedup over a json file-source directory of
    * (doc_id, text) documents — literally the batch plan
    * ([[graft.operators.Dedup.exactAgg]]) over a streaming source. */
  def dedupStream(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame =
    graft.operators.Dedup.exactAgg(
      fileSource(spark, dir, docSchema, maxFilesPerTrigger))

  /** Streaming quality/language cleaning stage (r13): the batch
    * [[graft.operators.CleanCorpus]] keep-verdict over a streaming
    * source — keep documents scoring ≥ `minQuality` AND predicted
    * English, emit (doc_id, quality). The verdict is the SAME
    * `scoredKeep` expression chain the batch pipeline applies (there per
    * distinct payload; here per row — a live micro-batch has no dup mass
    * to collapse), so backfill and live ingest provably agree. Stateless
    * map-only: append mode, no state store, no watermark. The batch
    * pipeline's duplicate-side anti-join is the separate [[dedupStream]]
    * / [[nearDupGate]] stages a production ingest composes around this
    * one (gate → admit → clean; IngestComposeSpec). */
  def cleanStream(
      spark: SparkSession, dir: String,
      minQuality: Double = 0.5, maxFilesPerTrigger: Int = 0): DataFrame =
    graft.operators.CleanCorpus.scoredKeep(
      fileSource(spark, dir, docSchema, maxFilesPerTrigger), minQuality)
      .select(col("doc_id"), col("quality"))

  /** Streaming FULL cleaning stage (r14): the complete per-payload
    * verdict — quality + English-majority + the repetition gate, one
    * codegen'd pass — followed by the map-only PII scrub, over a live
    * source: the streaming twin of [[graft.operators.CleanCorpus
    * .cleanFull]] minus its duplicate-side anti-join (that is the
    * separate [[nearDupGateRepr]] stage a production ingest composes
    * around this one). Emits (doc_id, quality, n_pii, redacted_md5) for
    * admitted documents. Stateless map-only — append mode, no state
    * store, no watermark; the repetition verdict uses the per-row
    * sorted-bigram-run formulation precisely so NO per-batch shuffle or
    * state appears here. */
  def cleanStreamFull(
      spark: SparkSession, dir: String,
      minQuality: Double = 0.5, maxFilesPerTrigger: Int = 0): DataFrame =
    graft.operators.CleanCorpus.scrubTail(
      graft.operators.CleanCorpus.scoredKeepFull(
        fileSource(spark, dir, docSchema, maxFilesPerTrigger), minQuality)
        .select(col("doc_id"), col("quality"), col("text")))

  /** Streaming NEAR-dup gate (r9): flag incoming documents that are
    * MinHash near-copies of the EXISTING corpus at `sfDir` — the batch
    * [[graft.operators.Dedup.nearDupGate]] over a streaming source.
    * Every stage is stateless (map-only signing, stream-static
    * band-bucket join with lowest-matching-band exactly-once emission,
    * static verify join), so the query runs in append mode with NO
    * streaming state: the corpus tables are the only working set,
    * built once per session. `maxDf` caps degenerate corpus band buckets
    * (see the batch scaladoc) — on the live ingest path an uncapped
    * constant bucket would fan every incoming doc out to O(bucket)
    * candidate rows per micro-batch. */
  def nearDupGate(
      spark: SparkSession,
      sfDir: String,
      streamDir: String,
      minEstimate: Double = 0.5,
      maxDf: Int = 1000,
      maxFilesPerTrigger: Int = 0): DataFrame =
    graft.operators.Dedup.nearDupGate(
      fileSource(spark, streamDir, docSchema, maxFilesPerTrigger),
      spark, sfDir, minEstimate = minEstimate, maxDf = maxDf)

  /** REPRESENTATIVE-level streaming near-dup gate — the scale-safe
    * ingest contract ([[graft.operators.Dedup.nearDupGateRepr]]): one
    * row per flagged incoming doc (doc_id, corpus_rep, n_corpus_matches,
    * est_jaccard) instead of one per (incoming, corpus-member) pair.
    * The per-doc aggregation is a streaming groupBy, but its keys never
    * span micro-batches — every candidate row of an incoming doc derives
    * from that doc's single input row, so within-batch state is complete
    * and each key emits exactly once. Run in UPDATE output mode (an
    * un-watermarked append would hold rows forever); under the
    * one-arrival-per-doc ingest contract update ≡ append.
    *
    * `stateTtl` bounds state-store growth on a long-running query: the
    * per-doc aggregate (constant size, but one per flagged doc) evicts
    * one TTL after its arrival batch via a processing-time window +
    * watermark inside [[graft.operators.Dedup.nearDupGateRepr]] — keys
    * never recur, so retention beyond the TTL buys nothing. A doc
    * RE-delivered (contract violation) within the TTL re-aggregates and
    * re-emits with an accumulated count — callers that cannot guarantee
    * one arrival per doc_id should front the stream with [[dedupStream]]
    * or accept re-emission. */
  def nearDupGateRepr(
      spark: SparkSession,
      sfDir: String,
      streamDir: String,
      minEstimate: Double = 0.5,
      maxDf: Int = 1000,
      stateTtl: String = "30 minutes",
      maxFilesPerTrigger: Int = 0): DataFrame =
    graft.operators.Dedup.nearDupGateRepr(
      fileSource(spark, streamDir, docSchema, maxFilesPerTrigger),
      spark, sfDir, minEstimate = minEstimate, maxDf = maxDf,
      stateTtl = Some(stateTtl))

  /** The per-batch ADMIT decision shared by [[ingestPipeline]] and its
    * batch-backfill equivalent: the full clean verdict (quality + langid
    * + repetition, one codegen'd pass), then the representative-level
    * near-dup gate against the EXISTING corpus at `sfDir` and the
    * flagged-complement anti-join. Output: the admitted (doc_id, text,
    * lang) rows, ready for `add_texts`. Every stage is the shared batch
    * implementation — that sharing is what makes backfill and live
    * ingest provably agree (spec-pinned). */
  def admitBatch(
      spark: SparkSession, sfDir: String, docs: DataFrame,
      minQuality: Double = 0.5): DataFrame = {
    val scored = graft.operators.CleanCorpus.scoredKeepFull(docs, minQuality)
      .select(col("doc_id"), col("text"), col("lang"))
    val flags = graft.operators.Dedup.nearDupGateRepr(
      scored.select(col("doc_id"), col("text")), spark, sfDir)
    scored.join(flags.select("doc_id"), Seq("doc_id"), "left_anti")
  }

  /** End-to-end LIVE ingest (r14): the reference's actual operating shape
    * — documents arrive at a RUNNING store, get cleaned, near-dup-gated
    * against the existing corpus, and the admitted remainder is
    * `add_texts`-ed as one delta generation per micro-batch
    * (/root/reference/app.py:24-47 runs exactly this pipeline, with the
    * cleaning/dedup inside the closed vector-store service). One
    * streaming query over a (doc_id, text, lang) json file source;
    * each micro-batch runs [[admitBatch]] then the shared CRUD append —
    * `foreachBatch`, not a pure streaming DAG, because admission is the
    * flagged-COMPLEMENT anti-join (not expressible stream-stream against
    * a streaming aggregate) and the store append is the transactional
    * CRUD surface. An all-rejected micro-batch appends nothing (no empty
    * generations). stream == batch composition is pinned by
    * CorpusStreamSpec.
    *
    * `startGen` defaults to [[graft.streaming.StoreStream.AutoGen]]:
    * resolved ONCE per checkpoint lifetime via
    * [[graft.streaming.StoreStream.durableStartGen]] (first start:
    * nextGen over base + delta, recorded in the checkpoint dir;
    * restarts: the recorded value), because the gen-presence receipt
    * identifies a batch by its gen alone — gen-of-batchId must neither
    * collide with gens already written (previous incarnations, batch
    * CRUD) nor SHIFT across a restart (a re-derived base would map a
    * crash-window replay to a fresh gen and double-append). The store
    * must stay single-writer while the stream runs. */
  def ingestPipeline(
      spark: SparkSession,
      sfDir: String,
      streamDir: String,
      storePath: String,
      checkpointDir: String,
      startGen: Long = graft.streaming.StoreStream.AutoGen,
      minQuality: Double = 0.5,
      maxFilesPerTrigger: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    // single-writer lease for the stream's lifetime (r17) — the shared
    // start protocol in StoreStream: a concurrent batch writer against
    // the ingesting store fails fast instead of corrupting gen
    // accounting; the base gen is resolved INSIDE the protocol, under
    // the lease (r18, ADVICE r17 medium — resolving it before the lease
    // let a racing batch append poison the recorded base)
    val owner = graft.streaming.StoreStream.streamOwner(checkpointDir)
    graft.streaming.StoreStream.startLeasedIngest(
      spark, storePath, checkpointDir, startGen) { base =>
      fileSource(spark, streamDir,
        graft.streaming.StoreStream.textSchema, maxFilesPerTrigger)
        .writeStream
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          ingestBatch(batch.sparkSession, sfDir, storePath, batch,
            base + batchId, minQuality, owner)
        }
        .start()
    }
  }

  /** One micro-batch of [[ingestPipeline]]: admit, then append the
    * admitted remainder as generation `gen` — IDEMPOTENT per generation.
    * foreachBatch replays a batchId after a crash between the store
    * append and the checkpoint commit, and the store append is
    * mode("append") — without the receipt check a replay would append
    * the same chunk rows a second time at the same gen, leaving
    * duplicate live vectors. gen-presence in the delta
    * ([[graft.operators.VectorIndex.genExists]]) is a complete receipt
    * because each micro-batch appends exactly one generation and an
    * all-rejected batch appends nothing (replaying it re-admits nothing
    * — still a no-op). The admitted frame is persisted across the
    * emptiness probe and the append: admission (clean verdict +
    * corpus-wide near-dup gate) is the expensive stage of every
    * micro-batch, and unpersisted it would execute twice. Replay
    * idempotency is pinned by CorpusStreamSpec. */
  def ingestBatch(
      spark: SparkSession, sfDir: String, storePath: String,
      batch: DataFrame, gen: Long, minQuality: Double = 0.5,
      owner: String =
        graft.operators.VectorIndex.newWriterOwner("append")): Unit =
    if (!graft.operators.VectorIndex.genExists(spark, storePath, gen)) {
      // cache the raw batch too: the admission plan references the
      // incoming rows on several branches (clean verdict, gate sign-side,
      // admit join), and uncached each branch re-reads the source files —
      // IngestBench measured 4 source scans per trigger without this
      val src = batch.persist()
      val admitted = admitBatch(spark, sfDir, src, minQuality).persist()
      try {
        if (!admitted.isEmpty)
          graft.operators.TextStore.addTextsAs(
            spark, storePath, admitted, gen, owner)
      } finally { admitted.unpersist(); src.unpersist() }
    }

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Streaming EMBEDDING ingest gate — [[nearDupGate]]'s contract for a
    * (vec_id, embedding) stream: flag incoming vectors that are
    * near-copies (exact cosine ≥ threshold) of the existing corpus, via
    * the shared batch implementation
    * ([[graft.operators.Dedup.embeddingNearDupGate]]). Stateless append
    * mode: map-only signing, stream-static band join with
    * lowest-alive-band exactly-once ownership, static cosine verify. */
  def embeddingNearDupGate(
      spark: SparkSession,
      sfDir: String,
      streamDir: String,
      threshold: Double = 0.9,
      maxFilesPerTrigger: Int = 0): DataFrame =
    graft.operators.Dedup.embeddingNearDupGate(
      fileSource(spark, streamDir, vecSchema, maxFilesPerTrigger),
      spark, sfDir, threshold = threshold)

  /** REPRESENTATIVE-level streaming embedding gate —
    * [[nearDupGateRepr]]'s contract for vectors, via the shared batch
    * implementation [[graft.operators.Dedup.embeddingNearDupGateRepr]].
    * UPDATE output mode; keys (vec_id) never span micro-batches;
    * `stateTtl` evicts per-key state as in [[nearDupGateRepr]]. */
  def embeddingNearDupGateRepr(
      spark: SparkSession,
      sfDir: String,
      streamDir: String,
      threshold: Double = 0.9,
      stateTtl: String = "30 minutes",
      maxFilesPerTrigger: Int = 0): DataFrame =
    graft.operators.Dedup.embeddingNearDupGateRepr(
      fileSource(spark, streamDir, vecSchema, maxFilesPerTrigger),
      spark, sfDir, threshold = threshold, stateTtl = Some(stateTtl))
}
