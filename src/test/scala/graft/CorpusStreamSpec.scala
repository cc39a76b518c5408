package graft

import graft.operators.Dedup
import graft.streaming.CorpusStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CorpusStreamSpec extends SparkSpec {

  test("streaming exact dedup matches the batch keep-set across micro-batches") {
    // stage the documents as multiple json chunks so the aggregation has to
    // merge state across micro-batches (not just within one)
    val dir = Files.createTempDirectory("docs_stream").toString
    Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").json(dir)

    val q = CorpusStream.dedupStream(spark, dir, maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("corpus_stream_spec")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("corpus_stream_spec")
      .select("keep_id", "text_md5", "n_copies").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = Dedup.exact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming clean stage matches the batch verdict across micro-batches (r13)") {
    val dir = Files.createTempDirectory("clean_stream").toString
    Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .repartition(3)
      .write.mode("overwrite").json(dir)

    val q = CorpusStream.cleanStream(spark, dir, maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("clean_stream_spec")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("clean_stream_spec").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    // the streaming stage IS the batch verdict chain per row: parity with
    // scoredKeep applied to the same frame
    val expected = graft.operators.CleanCorpus.scoredKeep(
        Tables.documents(spark, sfDir).select("doc_id", "text"), 0.5)
      .select("doc_id", "quality").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(streamed.nonEmpty && streamed == expected)
    // and the full batch pipeline is this verdict minus the duplicate ids
    val cleaned = graft.operators.CleanCorpus.clean(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(cleaned.subsetOf(streamed),
      s"batch clean emitted rows the verdict stage rejects: ${cleaned -- streamed}")
  }

  test("streaming FULL clean stage matches the batch composed verdict across micro-batches (r14)") {
    val dir = Files.createTempDirectory("clean_full_stream").toString
    Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .repartition(3)
      .write.mode("overwrite").json(dir)

    // append mode + maxFilesPerTrigger=1 forces three separate stateless
    // micro-batches — the full verdict (quality + langid + repetition)
    // and the scrub must be per-row computable for this to even run
    val q = CorpusStream.cleanStreamFull(spark, dir, maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("clean_full_stream_spec")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("clean_full_stream_spec").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getString(3)))
      .toSet
    val expected = graft.operators.CleanCorpus.scrubTail(
        graft.operators.CleanCorpus.scoredKeepFull(
          Tables.documents(spark, sfDir).select("doc_id", "text"), 0.5)
          .select(col("doc_id"), col("quality"), col("text")))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(streamed.nonEmpty && streamed == expected)
    // the batch composed pipeline is this verdict minus the duplicate ids
    val full = graft.operators.CleanCorpus.cleanFull(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getString(3)))
      .toSet
    assert(full.subsetOf(streamed),
      s"batch cleanFull emitted rows the stream stage rejects: ${full -- streamed}")
  }

  test("end-to-end live ingest: clean -> gate -> running store equals the batch composition (r14)") {
    import spark.implicits._
    import graft.operators.{CleanCorpus, TextStore}
    // incoming mix, one class per rejection stage plus the admitted class:
    //   - re-ingests of corpus docs that PASS the full clean verdict
    //     (so only the near-dup gate can reject them)
    //   - a low-quality doc (clean quality gate rejects)
    //   - a repetitive doc that passes quality+langid (repetition gate rejects)
    //   - novel good docs (must be admitted and become retrievable)
    val cleanIds = CleanCorpus.cleanFull(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).take(4).toSet
    val reIngest = Tables.documents(spark, sfDir)
      .where(col("doc_id").isin(cleanIds.toSeq: _*))
      .select("text").collect().map(_.getString(0)).zipWithIndex
      .map { case (t, i) => (930000L + i, t, "en") }
    val lowQ = Seq((940000L, "zzz", "en"))
    val repetitive = Seq((941000L,
      Array.fill(60)("spam").mkString(" "), "en"))
    val novel = (0 until 4).map(i =>
      (970000L + i, s"qqwzx$i entirely novel payload nothing shared " +
        s"with the corpus zebra$i quark$i flux$i jolt$i vex$i nymph$i " +
        s"a small fast document about glacier$i and meadow$i", "en"))
    val incoming = (reIngest ++ lowQ ++ repetitive ++ novel).toSeq
    val incomingDf = incoming.toDF("doc_id", "text", "lang")
    // the repetitive doc really is rejected by the repetition gate, not
    // the quality/langid stage
    assert(CleanCorpus.scoredKeep(incomingDf, 0.5)
      .where(col("doc_id") === 941000L).count() == 1)

    val dir = Files.createTempDirectory("ingest_e2e_stream").toString
    incomingDf.repartition(3).write.mode("overwrite").json(dir)

    // LIVE: the composed pipeline over forced multi-file micro-batches,
    // appending to a RUNNING store seeded from the corpus
    val streamedStore = Files.createTempDirectory("ingest_e2e_store").toString
    TextStore.writeChunkStore(spark, sfDir, streamedStore)
    val q = CorpusStream.ingestPipeline(spark, sfDir, dir, streamedStore,
      startGen = 1L,
      checkpointDir = Files.createTempDirectory("ingest_e2e_ckpt").toString,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable()
    finally q.stop()

    // BATCH: the same composition in one shot into a second store
    val batchStore = Files.createTempDirectory("ingest_e2e_batch").toString
    TextStore.writeChunkStore(spark, sfDir, batchStore)
    val admitted = CorpusStream.admitBatch(spark, sfDir, incomingDf)
    val admittedIds = admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admittedIds == novel.map(_._1).toSet,
      s"admit decided the wrong set: $admittedIds")
    TextStore.addTexts(spark, batchStore, admitted, gen = 1L)

    // the two stores hold the SAME admitted chunks (gen numbering is the
    // only allowed difference: one delta gen per non-empty micro-batch
    // live, one gen batch)
    def delta(path: String): Set[(Long, Int, String)] =
      spark.read.parquet(s"$path/vectors_delta")
        .where(!col("deleted"))
        .select("vec_id", "label", "metadata").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val streamedRows = delta(streamedStore)
    assert(streamedRows.nonEmpty)
    assert(streamedRows == delta(batchStore))
    // and no rejected class leaked into the store
    val storedDocIds = streamedRows
      .map(t => t._1 / 4096L) // vec_id = doc_id * ChunkMod + chunk_id
    assert(storedDocIds == novel.map(_._1).toSet,
      s"store holds non-admitted docs: ${storedDocIds -- novel.map(_._1)}")

    // retrieval surface: a novel doc's text finds its own chunk top-1 on
    // the live store
    val hit = TextStore.searchByText(spark, streamedStore, novel.head._2, k = 1)
      .collect().head // (doc_id, chunk_id, score)
    assert(hit.getLong(0) == novel.head._1)
  }

  test("ingest replay is idempotent: re-running a committed batchId appends nothing (r15)") {
    import spark.implicits._
    import graft.operators.{TextStore, VectorIndex}
    // the crash window foreachBatch replays into: store append committed,
    // checkpoint commit lost -> the SAME (batch, batchId) runs again
    val novel = (0 until 3).map(i =>
      (975000L + i, s"replay$i wholly novel payload kraken$i sable$i " +
        s"a compact document about archipelago$i and tundra$i drift$i", "en"))
    val batch = novel.toDF("doc_id", "text", "lang")
    val store = Files.createTempDirectory("ingest_replay_store").toString
    TextStore.writeChunkStore(spark, sfDir, store)

    def deltaRows(): Seq[(Long, Long)] =
      spark.read.parquet(s"$store/vectors_delta")
        .select("vec_id", "gen").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq

    assert(!VectorIndex.genExists(spark, store, 7L)) // delta-less store
    CorpusStream.ingestBatch(spark, sfDir, store, batch, gen = 7L)
    val afterFirst = deltaRows()
    assert(afterFirst.nonEmpty && afterFirst.forall(_._2 == 7L))
    assert(VectorIndex.genExists(spark, store, 7L))
    assert(!VectorIndex.genExists(spark, store, 8L))
    // the replay: same batch, same gen — must be a byte-level no-op, not
    // a second append of the same chunk rows at the same gen
    CorpusStream.ingestBatch(spark, sfDir, store, batch, gen = 7L)
    assert(deltaRows() == afterFirst,
      "replayed micro-batch duplicated live vectors")
    // an all-rejected batch appends nothing and stays replayable: every
    // doc fails the quality gate, so no gen-8 receipt exists and both
    // runs are no-ops (replay re-admits nothing)
    val rejected = Seq((976100L, "zzz", "en"), (976101L, "q q q", "en"))
      .toDF("doc_id", "text", "lang")
    CorpusStream.ingestBatch(spark, sfDir, store, rejected, gen = 8L)
    CorpusStream.ingestBatch(spark, sfDir, store, rejected, gen = 8L)
    assert(!VectorIndex.genExists(spark, store, 8L))
    assert(deltaRows() == afterFirst)
  }

  test("streaming near-dup gate matches the batch gate, stateless, across micro-batches") {
    import spark.implicits._
    // incoming mix: exact copies of corpus documents under NEW ids (must
    // flag at est 1.0), plus clearly novel documents (must not flag)
    val corpusTexts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(8)
    val incoming =
      corpusTexts.zipWithIndex.map { case ((_, t), i) => (900000L + i, t) } ++
        (0 until 5).map(i =>
          (950000L + i, s"qqwzx$i entirely novel payload nothing shared " +
            s"with corpus zebra$i quark$i flux$i jolt$i vex$i nymph$i"))
    val incomingDf = incoming.toSeq.toDF("doc_id", "text")
    val dir = Files.createTempDirectory("neardup_stream").toString
    incomingDf.repartition(3).write.mode("overwrite").json(dir)

    val q = CorpusStream.nearDupGate(spark, sfDir, dir, maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("neardup_gate_spec")
      .outputMode("append") // stateless: no aggregation, no watermark
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("neardup_gate_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly-once emission must hold without any stateful dedupe
    assert(streamed.length == streamed.distinct.length,
      s"duplicate gate emission: ${streamed.diff(streamed.distinct).toSeq}")
    val batch = Dedup.nearDupGate(incomingDf, spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batch.length == batch.distinct.length)
    assert(streamed.toSet == batch.toSet,
      s"stream/batch divergence: ${streamed.toSet.diff(batch.toSet).take(5)} / " +
        s"${batch.toSet.diff(streamed.toSet).take(5)}")
    // the exact copies are flagged against their source at est 1.0
    corpusTexts.zipWithIndex.foreach { case ((srcId, _), i) =>
      assert(streamed.exists(e => e._1 == 900000L + i && e._2 == srcId && e._3 == 1.0),
        s"copy of corpus doc $srcId not flagged")
    }
    // novel documents never flag
    assert(!streamed.exists(_._1 >= 950000L), "novel doc wrongly flagged")
  }

  test("streaming embedding gate matches the batch gate, stateless, across micro-batches") {
    import spark.implicits._
    // incoming mix: exact copies of corpus vectors under NEW ids (must
    // flag against their source at cos 1.0), plus negated corpus vectors
    // (cos -1.0 to their source, ~0 elsewhere — must never flag)
    val corpusVecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).take(6)
    val incoming: Seq[(Long, Array[Float])] =
      corpusVecs.toSeq.zipWithIndex
        .map { case ((_, v), i) => (800000L + i, v) } ++
        corpusVecs.take(3).zipWithIndex
          .map { case ((_, v), i) => (850000L + i, v.map(x => -x)) }
    val incomingDf = incoming.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("embgate_stream").toString
    incomingDf.repartition(3).write.mode("overwrite").json(dir)

    val q = CorpusStream.embeddingNearDupGate(spark, sfDir, dir, maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("embedding_gate_spec")
      .outputMode("append") // stateless: no aggregation, no watermark
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("embedding_gate_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.length == streamed.distinct.length,
      s"duplicate gate emission: ${streamed.diff(streamed.distinct).toSeq}")
    val batch = Dedup.embeddingNearDupGate(incomingDf, spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(batch.length == batch.distinct.length)
    assert(streamed.toSet == batch.toSet,
      s"stream/batch divergence: ${streamed.toSet.diff(batch.toSet).take(5)} / " +
        s"${batch.toSet.diff(streamed.toSet).take(5)}")
    // each copied vector flags against its source at exactly 1.0
    corpusVecs.zipWithIndex.foreach { case ((srcId, _), i) =>
      assert(streamed.exists(e => e._1 == 800000L + i && e._2 == srcId && e._3 == 1.0),
        s"copy of corpus vec $srcId not flagged")
    }
    // negated vectors never flag
    assert(!streamed.exists(_._1 >= 850000L), "negated vec wrongly flagged")
  }

  test("streaming representative-level gates match the batch repr mode, exactly once") {
    import spark.implicits._
    // repr mode is a per-incoming-doc aggregation; every candidate row of
    // a doc derives from its single input row, so keys never span
    // micro-batches and update mode emits each key exactly once. Stage
    // incoming across several json chunks WITH maxFilesPerTrigger = 1 so
    // each chunk really is its own micro-batch (without the option the
    // file source drains the whole directory in one trigger and the
    // cross-batch claim is vacuous).
    val corpusTexts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(8)
    val incoming =
      corpusTexts.zipWithIndex.map { case ((_, t), i) => (900000L + i, t) } ++
        (0 until 5).map(i =>
          (950000L + i, s"qqwzx$i entirely novel payload nothing shared " +
            s"with corpus zebra$i quark$i flux$i jolt$i vex$i nymph$i"))
    val incomingDf = incoming.toSeq.toDF("doc_id", "text")
    val dir = Files.createTempDirectory("neardup_repr_stream").toString
    incomingDf.repartition(3).write.mode("overwrite").json(dir)

    val q = CorpusStream.nearDupGateRepr(spark, sfDir, dir, maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("neardup_repr_spec")
      .outputMode("update") // per-key agg; keys never recur across batches
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("neardup_repr_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.map(_._1).distinct.length == streamed.length,
      s"repr gate emitted a doc twice: ${streamed.toSeq.sortBy(_._1)}")
    val batch = Dedup.nearDupGateRepr(incomingDf, spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSet == batch.toSet,
      s"stream/batch repr divergence: ${streamed.toSet.diff(batch.toSet).take(5)} / " +
        s"${batch.toSet.diff(streamed.toSet).take(5)}")
    // every exact copy flags once at est 1.0 with a positive corpus count
    corpusTexts.zipWithIndex.foreach { case ((_, _), i) =>
      val row = streamed.find(_._1 == 900000L + i)
      assert(row.nonEmpty, s"copy ${900000L + i} not flagged")
      assert(row.get._4 == 1.0 && row.get._3 >= 1L, s"bad repr row: $row")
    }
    assert(!streamed.exists(_._1 >= 950000L), "novel doc wrongly flagged")

    // embedding twin: copies of corpus vectors flag once, negations never
    val corpusVecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).take(6)
    val vin: Seq[(Long, Array[Float])] =
      corpusVecs.toSeq.zipWithIndex
        .map { case ((_, v), i) => (800000L + i, v) } ++
        corpusVecs.take(3).zipWithIndex
          .map { case ((_, v), i) => (850000L + i, v.map(x => -x)) }
    val vinDf = vin.toDF("vec_id", "embedding")
    val vdir = Files.createTempDirectory("embgate_repr_stream").toString
    vinDf.repartition(3).write.mode("overwrite").json(vdir)
    val vq = CorpusStream.embeddingNearDupGateRepr(spark, sfDir, vdir, maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("embedding_repr_spec")
      .outputMode("update")
      .start()
    try vq.processAllAvailable()
    finally vq.stop()
    val vstreamed = spark.table("embedding_repr_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(vstreamed.map(_._1).distinct.length == vstreamed.length)
    val vbatch = Dedup.embeddingNearDupGateRepr(vinDf, spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(vstreamed.toSet == vbatch.toSet,
      s"stream/batch embedding repr divergence: " +
        s"${vstreamed.toSet.diff(vbatch.toSet).take(5)} / " +
        s"${vbatch.toSet.diff(vstreamed.toSet).take(5)}")
    assert(vstreamed.count(_._1 < 850000L) == corpusVecs.length,
      s"not all copies flagged: ${vstreamed.toSeq.sortBy(_._1)}")
    assert(!vstreamed.exists(_._1 >= 850000L), "negated vec wrongly flagged")
  }

  test("repr gate re-delivery contract: a doc arriving twice re-aggregates and re-emits") {
    import spark.implicits._
    // The streaming repr gates assume ONE arrival per doc_id. This spec
    // pins what happens when that contract is VIOLATED — the same doc
    // delivered in two separate micro-batches: update mode re-aggregates
    // the second arrival against retained state and re-emits the key with
    // an accumulated n_corpus_matches (2x when both arrivals land in the
    // same stateTtl processing-time window, which is the practical case;
    // a re-start from n is defined only across a window boundary or after
    // TTL eviction). Upstream must dedupe arrivals (e.g. front with
    // dedupStream) or accept re-emission — re-delivery is NOT silently
    // idempotent.
    val corpusTexts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(3)
    val incomingDf = corpusTexts.zipWithIndex
      .map { case ((_, t), i) => (910000L + i, t) }.toSeq.toDF("doc_id", "text")
    // one json part file, delivered TWICE as separate micro-batches
    val src = Files.createTempDirectory("redeliver_src").toString
    incomingDf.coalesce(1).write.mode("overwrite").json(src)
    val part = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".json")).head.toPath
    val dir = Files.createTempDirectory("redeliver_stream")
    java.nio.file.Files.copy(part, dir.resolve("arrival_a.json"))
    java.nio.file.Files.copy(part, dir.resolve("arrival_b.json"))

    val q = CorpusStream.nearDupGateRepr(spark, sfDir, dir.toString,
        maxFilesPerTrigger = 1)
      .writeStream
      .format("memory")
      .queryName("redeliver_repr_spec")
      .outputMode("update")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val emitted = spark.table("redeliver_repr_spec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = Dedup.nearDupGateRepr(incomingDf, spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .map(r => r._1 -> r).toMap
    corpusTexts.indices.foreach { i =>
      val id = 910000L + i
      val rows = emitted.filter(_._1 == id).sortBy(_._3)
      val n = batch(id)._3
      assert(rows.length == 2, s"doc $id emitted ${rows.length} times, not 2: ${rows.toSeq}")
      // rep and estimate are arrival-order-independent; the count
      // accumulates across arrivals in the same state window
      rows.foreach { r =>
        assert(r._2 == batch(id)._2 && r._4 == batch(id)._4, s"bad repr row: $r")
      }
      val counts = rows.map(_._3).toSeq
      assert(counts == Seq(n, 2 * n) || counts == Seq(n, n),
        s"doc $id counts $counts; expected Seq($n, ${2 * n}) (same window) " +
          s"or Seq($n, $n) (window-boundary straddle)")
    }
  }
}
