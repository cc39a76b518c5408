package graft

import graft.operators.{KnnSearch, VectorIndex}
import graft.streaming.StoreStream
import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths}

/** Pins the single-writer lease (r17, VERDICT r16 item 2): the gen
  * receipt and stale-_temporary cleanup are sound only under one writer,
  * which used to be a doc-comment contract — now a second writer fails
  * fast instead of silently corrupting gen accounting. */
class WriterLeaseSpec extends SparkSpec {

  private def leaseFile(store: String) = Paths.get(s"$store/_writer_lease")

  private def vecBatch(base: Long): DataFrame = {
    import spark.implicits._
    val qv = KnnSearch.queryVector(spark, sfDir, 0L).toSeq
    Seq((base, 8, qv), (base + 1, 9, qv))
      .toDF("vec_id", "label", "embedding")
  }

  test("batch writers lease per call and leave the store unlocked") {
    val store = Files.createTempDirectory("lease_batch").toString
    VectorIndex.writeStore(spark, sfDir, store)
    VectorIndex.appendStore(spark, store, vecBatch(5100000L), gen = 1L)
    assert(!Files.exists(leaseFile(store)),
      "append left its per-call lease behind")
    VectorIndex.deleteFromStore(spark, store, Seq(5100000L), gen = 2L)
    VectorIndex.compactStore(spark, store)
    VectorIndex.recoverStore(spark, store)
    assert(!Files.exists(leaseFile(store)))
  }

  test("a held lease rejects every batch writer, naming the holder") {
    val store = Files.createTempDirectory("lease_held").toString
    VectorIndex.writeStore(spark, sfDir, store)
    val owner = "stream:/ckpt/held-by-a-stream"
    assert(VectorIndex.acquireWriterLease(spark, store, owner).isDefined)
    val e = intercept[IllegalStateException](
      VectorIndex.appendStore(spark, store, vecBatch(5200000L), gen = 1L))
    assert(e.getMessage.contains(owner) &&
      e.getMessage.contains("breakWriterLease"),
      s"rejection must name the holder and the remedy: ${e.getMessage}")
    intercept[IllegalStateException](
      VectorIndex.deleteFromStore(spark, store, Seq(0L), gen = 2L))
    intercept[IllegalStateException](VectorIndex.compactStore(spark, store))
    // the rejected append must not have landed anything
    assert(!VectorIndex.genExists(spark, store, 1L))
    VectorIndex.releaseWriterLease(spark, store, owner)
    VectorIndex.appendStore(spark, store, vecBatch(5200000L), gen = 1L)
    assert(VectorIndex.genExists(spark, store, 1L))
  }

  test("acquisition is reentrant by owner; inner release keeps the lease") {
    val store = Files.createTempDirectory("lease_reentrant").toString
    VectorIndex.writeStore(spark, sfDir, store)
    val owner = "stream:/ckpt/reentrant"
    assert(VectorIndex.acquireWriterLease(spark, store, owner).isDefined)
    // the stream's own foreachBatch path: same owner, append succeeds and
    // the stream-lifetime lease survives the inner call's release
    VectorIndex.appendStoreAs(spark, store, vecBatch(5300000L), 1L, owner)
    assert(Files.exists(leaseFile(store)),
      "reentrant inner call released the outer holder's lease")
    // re-acquiring one's own lease reports not-created (restart semantics)
    assert(VectorIndex.acquireWriterLease(spark, store, owner).isEmpty)
    // a foreign release is a no-op
    VectorIndex.releaseWriterLease(spark, store, "someone-else")
    assert(Files.exists(leaseFile(store)))
    VectorIndex.releaseWriterLease(spark, store, owner)
    assert(!Files.exists(leaseFile(store)))
  }

  test("owners never alias by prefix, and epochs fence stale releases") {
    val store = Files.createTempDirectory("lease_epoch").toString
    VectorIndex.writeStore(spark, sfDir, store)
    // a space-containing owner must not be reentrant for its prefix
    // (checkpoint paths may contain spaces: '/ck/a b' vs '/ck/a')
    assert(VectorIndex.acquireWriterLease(
      spark, store, "stream:/ck/a b").isDefined)
    intercept[IllegalStateException](
      VectorIndex.acquireWriterLease(spark, store, "stream:/ck/a"))
    VectorIndex.releaseWriterLease(spark, store, "stream:/ck/a b")
    // incarnation 1 creates; a restart re-stamps the epoch; incarnation
    // 1's late exact-content release must then be a NO-OP (the bug class:
    // a stale termination event deleting a successor's live lease)
    val owner = "stream:/ck/epoch"
    val c1 = VectorIndex.acquireWriterLease(spark, store, owner).get
    val c2 = VectorIndex.refreshWriterLease(spark, store, owner)
    assert(c1 != c2)
    VectorIndex.releaseWriterLeaseExact(spark, store, c1)
    assert(Files.exists(leaseFile(store)),
      "stale incarnation's release deleted the successor's lease")
    VectorIndex.releaseWriterLeaseExact(spark, store, c2)
    assert(!Files.exists(leaseFile(store)))
  }

  test("a live same-session duplicate start fails fast and leaves the running stream's lease intact") {
    val store = Files.createTempDirectory("lease_dup_store").toString
    VectorIndex.writeStore(spark, sfDir, store)
    val dir = Files.createTempDirectory("lease_dup_src").toString
    vecBatch(5700000L).write.mode("overwrite").json(dir)
    val ckpt = Files.createTempDirectory("lease_dup_ck").toString
    val q = StoreStream.ingest(spark, dir, store, ckpt)
    try {
      q.processAllAvailable()
      // the r17 review's bug class: a second start on the SAME checkpoint
      // used to steal the lease epoch and, when Spark rejected the
      // duplicate, tear the lease down under the live query
      intercept[IllegalStateException](
        StoreStream.ingest(spark, dir, store, ckpt))
      assert(Files.exists(leaseFile(store)),
        "failed duplicate start released the running stream's lease")
      // and the running stream still ingests under its lease
      intercept[IllegalStateException](
        VectorIndex.appendStore(spark, store, vecBatch(5800000L), gen = 98L))
    } finally q.stop()
    q.awaitTermination()
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (Files.exists(leaseFile(store)) && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(!Files.exists(leaseFile(store)))
  }

  test("breakWriterLease un-bricks a store whose holder crashed") {
    val store = Files.createTempDirectory("lease_break").toString
    VectorIndex.writeStore(spark, sfDir, store)
    VectorIndex.acquireWriterLease(spark, store, "stream:/ckpt/crashed")
    intercept[IllegalStateException](
      VectorIndex.appendStore(spark, store, vecBatch(5400000L), gen = 1L))
    VectorIndex.breakWriterLease(spark, store)
    VectorIndex.appendStore(spark, store, vecBatch(5400000L), gen = 1L)
    assert(VectorIndex.genExists(spark, store, 1L))
  }

  test("a running ingest stream holds the lease; termination releases it") {
    val store = Files.createTempDirectory("lease_stream_store").toString
    VectorIndex.writeStore(spark, sfDir, store)
    val dir = Files.createTempDirectory("lease_stream_src").toString
    vecBatch(5500000L).write.mode("overwrite").json(dir)
    val ckpt = Files.createTempDirectory("lease_stream_ck").toString
    val q = StoreStream.ingest(spark, dir, store, ckpt)
    try {
      q.processAllAvailable()
      assert(Files.exists(leaseFile(store)),
        "running stream does not hold the writer lease")
      // the enforcement the lease exists for: a concurrent batch writer
      // against the ingesting store fails fast
      val e = intercept[IllegalStateException](
        VectorIndex.appendStore(spark, store, vecBatch(5600000L), gen = 99L))
      assert(e.getMessage.contains(StoreStream.streamOwner(ckpt)))
    } finally q.stop()
    q.awaitTermination()
    // release rides the async listener bus — poll briefly
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (Files.exists(leaseFile(store)) && System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(!Files.exists(leaseFile(store)),
      "stream termination did not release the writer lease")
    VectorIndex.appendStore(spark, store, vecBatch(5600000L), gen = 99L)
    assert(VectorIndex.genExists(spark, store, 99L))
  }
}
