package graft

import graft.operators.{KnnSearch, VectorIndex}
import graft.tools.BranchVerify
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Churned-store parity IN THE SUITE (r19, VERDICT r18 item 4): the
  * BranchVerify invariant — content-preserving churn (every live row
  * tombstoned and byte-identically re-appended) leaves every read
  * IDENTICAL — is the strongest evidence we have for the multi-gen
  * resolution and merge-on-read delta branches, but it lived only in the
  * round tool + bench artifacts, so a regression would surface at a
  * round-end audit instead of `sbt test`. This spec pins it per-layout
  * with the SAME churn helper the tool uses (small store, one run).
  * BranchVerify remains the oracle-grade harness. */
class ChurnParitySpec extends SparkSpec {

  private def ivfReads(path: String): Seq[Any] = {
    val qv = KnnSearch.queryVector(spark, sfDir, 0L)
    Seq(
      VectorIndex.searchStore(spark, path, qv, k = 10, nprobe = 4,
        filter = Some(col("vec_id") =!= 0L))
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq,
      // getByIds carries no ordering contract: compare as a sorted set
      VectorIndex.getByIds(spark, path, Seq(3L, 7L, 11L))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2)))
        .sortBy(_._1).toSeq,
      VectorIndex.ivfPqSearchStoreAt(spark, path, qv, k = 10, nprobe = 4,
        excludeId = Some(0L))
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq)
  }

  private def lshReads(path: String): Seq[Any] = {
    val qv = KnnSearch.queryVector(spark, sfDir, 0L)
    Seq(
      VectorIndex.searchLshStore(spark, path, qv, k = 10,
        filter = Some(col("vec_id") =!= 0L))
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq,
      VectorIndex.getByIds(spark, path, Seq(3L, 7L, 11L))
        .collect().map(r => (r.getLong(0), r.get(1), r.get(2)))
        .sortBy(_._1).toSeq)
  }

  test("content-preserving churn leaves every IVF store read identical") {
    val path = Files.createTempDirectory("churn_ivf").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val before = ivfReads(path)
    val gens = BranchVerify.churn(spark, path, isLsh = false)
    assert(gens >= 2, "churn must write at least one generation pair")
    assert(!VectorIndex.isSingleGen(spark, path),
      "churn must force the multi-gen resolution branch")
    assert(ivfReads(path) == before,
      "churned store reads diverged from the un-churned store")
    // and compaction folds it back to the same answers on the fast path
    VectorIndex.compactStore(spark, path)
    assert(VectorIndex.isSingleGen(spark, path))
    assert(ivfReads(path) == before)
  }

  test("content-preserving churn leaves every LSH store read identical") {
    val path = Files.createTempDirectory("churn_lsh").toString
    VectorIndex.writeLshStore(spark, sfDir, path)
    val before = lshReads(path)
    val gens = BranchVerify.churn(spark, path, isLsh = true)
    assert(gens >= 2)
    assert(!VectorIndex.isSingleGen(spark, path))
    assert(lshReads(path) == before,
      "churned LSH store reads diverged from the un-churned store")
    VectorIndex.compactLshStore(spark, path)
    assert(VectorIndex.isSingleGen(spark, path))
    assert(lshReads(path) == before)
  }
}
