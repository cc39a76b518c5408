package graft.tools

import graft.{Bench, GraftSession, Tables}
import graft.streaming.CorpusStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Live-ingest scale bench (VERDICT r14 item 7): run the end-to-end
  * [[graft.streaming.CorpusStream.ingestPipeline]] — clean → corpus-wide
  * near-dup gate → generational store append — over MANY micro-batches
  * against a large corpus, and record the per-batch trigger latency the
  * streaming engine itself measures.
  *
  * The claim under test is the 100 TB shape: per-batch cost must be a
  * function of BATCH size, not of store size or batch count. The two
  * ways a naive composition would fail it:
  *   - re-deriving the corpus band table per batch (the gate's static
  *     side is `materialized` once per session — batch 1 pays it, the
  *     rest must not);
  *   - an append whose sticky-placement probe degrades as delta
  *     generations accumulate (the store DOUBLES over this run while
  *     batch size stays constant — a flat curve is the receipt).
  *
  * Incoming mix per batch (staged as one json file per micro-batch,
  * maxFilesPerTrigger=1): half verbatim corpus re-ingests under fresh
  * ids — the gate must FLAG these, exercising the full match path — and
  * half "novel" variants with every 4th token replaced by 'the': any 5
  * consecutive tokens contain a replaced position, so no 5-token shingle
  * survives and the gate admits them (quality keeps 3/4 of the original
  * words plus added stopwords, so the clean stage passes them too).
  * Admitted halves append as one generation each, growing the store
  * linearly in batch index.
  *
  * Env: SPARK_GRAFT_SF_DIR (corpus the gate runs against),
  * SPARK_GRAFT_INGEST_SEED (corpus that seeds the chunk store; defaults
  * to sf0.1 so the seed build stays bounded at any gate SF),
  * SPARK_GRAFT_INGEST_BATCHES (default 20), SPARK_GRAFT_INGEST_ROWS
  * (default 10000 docs/batch). Prints ONE JSON line with per-batch
  * seconds, per-gen appended row counts, and the calibration block. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val seedDir = sys.env.getOrElse("SPARK_GRAFT_INGEST_SEED", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_INGEST_BATCHES", "20").toInt
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_INGEST_ROWS", "10000").toInt
    val spark = GraftSession.local(cpus)
    val calibPre = Bench.calibrate(spark, sfDir)

    // ---- stage the stream: one json file per micro-batch ----
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft_ingest_stream").toString
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val half = math.max(1, batchRows / 2)
    // deterministic disjoint slices: slot = xxhash64(doc_id) mod (2*nBatches*F)
    // where F oversizes the slot space so a limit(half) cap is the only
    // nondeterminism and every batch still fills
    val slots = math.max(2 * nBatches, (nDocs / half).toInt)
    val sliced = docs.withColumn("slot", pmod(xxhash64(col("doc_id")), lit(slots)))
    val novelText = expr(
      "array_join(transform(split(text, ' '), (t, i) -> IF(i % 4 = 0, 'the', t)), ' ')")
    val t0Stage = System.nanoTime()
    for (b <- 0 until nBatches) {
      val dup = sliced.where(col("slot") === b * 2).limit(half)
        .select((col("doc_id") + 800000000L).as("doc_id"), col("text"),
          lit("en").as("lang"))
      val novel = sliced.where(col("slot") === b * 2 + 1).limit(half)
        .select((col("doc_id") + 500000000L).as("doc_id"),
          novelText.as("text"), lit("en").as("lang"))
      dup.unionAll(novel).coalesce(1).write.mode("overwrite")
        .json(s"$streamDir/batch_$b")
    }
    // flatten: the file source wants one dir of files, ordered by name so
    // maxFilesPerTrigger=1 replays them as one micro-batch each
    val flat = java.nio.file.Files
      .createTempDirectory("graft_ingest_flat").toString
    for (b <- 0 until nBatches) {
      val src = new java.io.File(s"$streamDir/batch_$b").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".json"))
      require(src.length == 1, s"batch $b staged ${src.length} files")
      java.nio.file.Files.move(src.head.toPath,
        java.nio.file.Paths.get(f"$flat/b$b%04d.json"))
    }
    val stageSec = (System.nanoTime() - t0Stage) / 1e9

    // ---- seed the running store ----
    val store = java.nio.file.Files
      .createTempDirectory("graft_ingest_store").toString
    val t0Seed = System.nanoTime()
    graft.operators.TextStore.writeChunkStore(spark, seedDir, store)
    val seedSec = (System.nanoTime() - t0Seed) / 1e9

    // ---- run the pipeline, listener records per-trigger latency ----
    val progress = new java.util.concurrent.ConcurrentHashMap[Long, (Double, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.numInputRows > 0)
          progress.put(p.batchId,
            (p.durationMs.getOrDefault("triggerExecution", 0L) / 1e3,
              p.numInputRows))
      }
    }
    spark.streams.addListener(listener)
    val t0Run = System.nanoTime()
    val q = CorpusStream.ingestPipeline(spark, sfDir, flat, store,
      startGen = 1L,
      checkpointDir = java.nio.file.Files
        .createTempDirectory("graft_ingest_ckpt").toString,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable()
    finally {
      q.stop()
      // progress events are posted async; give the bus a beat so the
      // final batch's event lands before we read the map
      Thread.sleep(2000)
      spark.streams.removeListener(listener)
    }
    val runSec = (System.nanoTime() - t0Run) / 1e9

    // ---- store growth: appended rows per generation ----
    val genRows = spark.read.parquet(s"$store/vectors_delta")
      .groupBy(col("gen")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val calibPost = Bench.calibrate(spark, sfDir)

    import java.util.Locale
    def fmtCal(m: Map[String, Double]): String =
      m.toSeq.sorted.map { case (k, v) =>
        String.format(Locale.ROOT, "\"%s\":%.4f", k, Double.box(v))
      }.mkString("{", ",", "}")
    val batchSecs = progress.entrySet().toArray
      .map(_.asInstanceOf[java.util.Map.Entry[Long, (Double, Long)]])
      .sortBy(_.getKey)
    val batchesJson = batchSecs
      .map(e => String.format(Locale.ROOT,
        "{\"batch\":%d,\"sec\":%.3f,\"rows\":%d}",
        Long.box(e.getKey), Double.box(e.getValue._1), Long.box(e.getValue._2)))
      .mkString("[", ",", "]")
    val gensJson = genRows
      .map { case (g, n) => s"""{"gen":$g,"rows":$n}""" }
      .mkString("[", ",", "]")
    // ---- flatness invariant (r16, VERDICT r15 item 4): per-batch cost
    // must track batch size, not store size or batch count. The first
    // recorded batch is warmup by contract (it pays the one-time corpus
    // band-table materialization); every later batch must stay within
    // FLAT_FACTOR x the median of the post-warmup batches, or the run
    // FAILS — a regression in gate or append scaling surfaces in the
    // artifact itself instead of needing an eyeball over the curve. ----
    val flatFactor = sys.env
      .getOrElse("SPARK_GRAFT_INGEST_FLAT_FACTOR", "1.5").toDouble
    val steady = batchSecs.drop(1).map(e => e.getKey -> e.getValue._1)
    val violations =
      if (steady.length < 3) Array.empty[(Long, Double)] // too few to judge
      else {
        val med = steady.map(_._2).sorted.apply(steady.length / 2)
        steady.filter(_._2 > flatFactor * med)
      }
    val violationsJson = violations
      .map { case (b, s) => String.format(Locale.ROOT,
        "{\"batch\":%d,\"sec\":%.3f}", Long.box(b), Double.box(s)) }
      .mkString("[", ",", "]")
    val line = String.format(Locale.ROOT,
      """{"metric":"ingest_pipeline","value":%.3f,"unit":"sec","sf":"%s","seed":"%s","n_batches":%d,"batch_rows":%d,"stage_sec":%.2f,"seed_sec":%.2f,"failed":%b,"flat_factor":%.2f,"flat_violations":%s,"batches":%s,"gens":%s,"calibration":{"pre":%s,"post":%s}}""",
      Double.box(runSec), sfDir, seedDir, Int.box(nBatches),
      Int.box(batchRows), Double.box(stageSec), Double.box(seedSec),
      Boolean.box(violations.nonEmpty), Double.box(flatFactor),
      violationsJson, batchesJson, gensJson,
      fmtCal(calibPre), fmtCal(calibPost))
    println(line)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_last.json"),
      line.getBytes("UTF-8"))
    spark.stop()
    if (violations.nonEmpty) {
      System.err.println(s"INGEST FLATNESS VIOLATION: ${violations.length} " +
        s"post-warmup batch(es) beyond ${flatFactor}x the steady median")
      sys.exit(1)
    }
  }
}
