package graft

import graft.operators.{KnnSearch, VectorIndex}
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-5 crash-safety of the compaction swap (VERDICT r3 item 5): the
  * old `delete(vectors)` → `rename(compact, vectors)` window could strand
  * a store with NO vectors directory. The staged swap (rename-old →
  * rename-new → delete-old) plus [[VectorIndex.recoverStore]] makes every
  * crash point recoverable; these specs manufacture the on-disk state of
  * each crash point and assert the store comes back readable. */
class CompactRecoverySpec extends SparkSpec {

  private def hfs =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def search(path: String): Seq[(Long, Double)] =
    VectorIndex.searchStore(spark, path, KnnSearch.queryVector(spark, sfDir, 0L),
      k = 10, nprobe = VectorIndex.K, filter = Some(col("vec_id") =!= 0L))
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq

  test("a failed first append (delta dir with only _temporary) leaves the store readable") {
    import spark.implicits._
    val path = Files.createTempDirectory("recover_delta").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val before = search(path)
    // crash state: Spark's commit protocol created vectors_delta and its
    // _temporary staging dir, but no data file ever committed. Reads
    // must treat this as an empty delta (explicit-schema read) — NOT an
    // 'unable to infer schema' failure — because recovery deliberately
    // never deletes a delta.
    hfs.mkdirs(new Path(s"$path/vectors_delta/_temporary/0"))
    assert(search(path) == before, "empty-delta store must read as the base")
    // and the store still accepts a real append afterwards
    val qv = KnnSearch.queryVector(spark, sfDir, 0L)
    VectorIndex.appendStore(spark, path,
      Seq((2000000L, 9, qv.toSeq)).toDF("vec_id", "label", "embedding"), gen = 1L)
    assert(search(path).head._1 == 2000000L)
  }

  test("crash between the two vectors renames: recoverStore rolls forward") {
    val path = Files.createTempDirectory("recover_fwd").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val before = search(path)

    // manufacture the crash point: staging complete (vectors_compact is a
    // full rewrite), old layout renamed aside, new layout NOT yet in place
    spark.read.parquet(s"$path/vectors")
      .write.partitionBy("centroid_id").parquet(s"$path/vectors_compact")
    hfs.rename(new Path(s"$path/vectors"), new Path(s"$path/vectors_old"))
    assert(!hfs.exists(new Path(s"$path/vectors")))

    VectorIndex.recoverStore(spark, path)
    assert(hfs.exists(new Path(s"$path/vectors")))
    assert(!hfs.exists(new Path(s"$path/vectors_old")))
    assert(!hfs.exists(new Path(s"$path/vectors_compact")))
    // recovery leaves the flag as found (here: still set by writeStore —
    // nothing cleared it); it never asserts it itself
    assert(VectorIndex.isSingleGen(spark, path))
    assert(search(path) == before)
  }

  test("recovery never re-asserts single-gen over post-crash mutations") {
    import spark.implicits._
    val path = Files.createTempDirectory("recover_mut").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val qv = KnnSearch.queryVector(spark, sfDir, 0L)

    // crash point: swap completed through rename(compact -> vectors) but
    // died before delete(vectors_old) — the store is readable
    spark.read.parquet(s"$path/vectors")
      .write.partitionBy("centroid_id").parquet(s"$path/vectors_old_stage")
    hfs.rename(new Path(s"$path/vectors_old_stage"), new Path(s"$path/vectors_old"))

    // a writer updates an id before anyone runs recovery: the flag is
    // legitimately cleared and a gen-1 row exists
    VectorIndex.appendStore(spark, path,
      Seq((1L, 7, qv.toSeq)).toDF("vec_id", "label", "embedding"), gen = 1L)
    assert(!VectorIndex.isSingleGen(spark, path))

    VectorIndex.recoverStore(spark, path)
    assert(!hfs.exists(new Path(s"$path/vectors_old")))
    // the flag must STAY off: the fast path would skip the resolution the
    // append requires (stale gen-0 copy of id 1 would come back)
    assert(!VectorIndex.isSingleGen(spark, path))
    val res = search(path)
    val v1 = res.find(_._1 == 1L).get
    assert(v1._2 == 1.0, s"latest generation of id 1 must win: $res")
    assert(res.count(_._1 == 1L) == 1, "no duplicate generations in results")
  }

  test("crash before the swap began: recoverStore rolls back, store untouched") {
    val path = Files.createTempDirectory("recover_back").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val before = search(path)

    // staging exists (possibly partial) but the live layout was never moved
    spark.read.parquet(s"$path/vectors").limit(5)
      .write.partitionBy("centroid_id").parquet(s"$path/vectors_compact")
    VectorIndex.recoverStore(spark, path)
    assert(!hfs.exists(new Path(s"$path/vectors_compact")))
    assert(search(path) == before)
  }

  test("crash mid model swap during retrain: recoverStore finishes the staged model") {
    val path = Files.createTempDirectory("recover_model").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val before = search(path)

    // crash point: vectors already swapped (old renamed aside, new live),
    // staged centroids not yet renamed into place
    spark.read.parquet(s"$path/centroids")
      .write.parquet(s"$path/centroids_retrain")
    spark.read.parquet(s"$path/vectors")
      .write.partitionBy("centroid_id").parquet(s"$path/vectors_old_src")
    hfs.rename(new Path(s"$path/vectors_old_src"), new Path(s"$path/vectors_old"))

    VectorIndex.recoverStore(spark, path)
    assert(!hfs.exists(new Path(s"$path/centroids_retrain")))
    assert(!hfs.exists(new Path(s"$path/centroids_old")))
    assert(!hfs.exists(new Path(s"$path/vectors_old")))
    assert(hfs.exists(new Path(s"$path/centroids")))
    assert(VectorIndex.isSingleGen(spark, path)) // as found, untouched
    assert(search(path) == before)
  }

  test("crash mid PQ-codebook swap during retrain: recoverStore finishes the staged codebooks") {
    val path = Files.createTempDirectory("recover_pq").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val before = search(path)
    val qv = KnnSearch.queryVector(spark, sfDir, 0L)
    val beforePq = VectorIndex.ivfPqSearchStoreAt(spark, path, qv,
      nprobe = VectorIndex.K, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSeq

    // crash point of the r19 retrain: vectors already swapped (old
    // renamed aside, new live — its codes computed from the STAGED
    // codebooks), centroids swap finished, pq_retrain not yet renamed
    // into place. Staged copies are byte-identical here, so recovery
    // must restore identical serving.
    spark.read.parquet(s"$path/pq").write.parquet(s"$path/pq_retrain")
    spark.read.parquet(s"$path/vectors")
      .write.partitionBy("centroid_id").parquet(s"$path/vectors_old_src")
    hfs.rename(new Path(s"$path/vectors_old_src"), new Path(s"$path/vectors_old"))

    VectorIndex.recoverStore(spark, path)
    assert(!hfs.exists(new Path(s"$path/pq_retrain")))
    assert(!hfs.exists(new Path(s"$path/pq_old")))
    assert(hfs.exists(new Path(s"$path/pq")))
    assert(search(path) == before)
    val afterPq = VectorIndex.ivfPqSearchStoreAt(spark, path, qv,
      nprobe = VectorIndex.K, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSeq
    assert(afterPq == beforePq, "quantized serving changed across recovery")
  }

  test("crash before the swap began: staged PQ codebooks are discarded") {
    val path = Files.createTempDirectory("recover_pq_back").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val before = search(path)
    // retrain staged a codebook re-fit (and a partial rewrite) but the
    // swap never began: roll-back must discard BOTH staging outputs
    spark.read.parquet(s"$path/pq").write.parquet(s"$path/pq_retrain")
    spark.read.parquet(s"$path/vectors").limit(5)
      .write.partitionBy("centroid_id").parquet(s"$path/vectors_compact")
    VectorIndex.recoverStore(spark, path)
    assert(!hfs.exists(new Path(s"$path/pq_retrain")))
    assert(!hfs.exists(new Path(s"$path/vectors_compact")))
    assert(hfs.exists(new Path(s"$path/pq")))
    assert(search(path) == before)
  }

  test("retrain compaction leaves no staged-model debris and PQ search serves the re-fit codebooks") {
    import spark.implicits._
    val path = Files.createTempDirectory("recover_retrain_e2e").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val qv = KnnSearch.queryVector(spark, sfDir, 0L)
    VectorIndex.appendStore(spark, path,
      Seq((1000002L, 4, qv.toSeq)).toDF("vec_id", "label", "embedding"), gen = 1L)
    VectorIndex.compactStore(spark, path, retrain = true)
    for (d <- Seq("vectors_old", "vectors_compact", "centroids_retrain",
        "centroids_old", "pq_retrain", "pq_old"))
      assert(!hfs.exists(new Path(s"$path/$d")), s"$d left behind")
    // the appended duplicate of the query vector must be the quantized
    // probe's top hit through the RE-FIT codebooks and recomputed codes
    val top = VectorIndex.ivfPqSearchStoreAt(spark, path, qv,
      nprobe = VectorIndex.K, excludeId = Some(0L))
      .collect().map(_.getLong(0)).head
    assert(top == 1000002L, s"expected the appended twin on top, got $top")
  }

  test("real compaction after appends survives and equals the merge-on-read answer") {
    import spark.implicits._
    val path = Files.createTempDirectory("recover_e2e").toString
    VectorIndex.writeStore(spark, sfDir, path)
    val qv = KnnSearch.queryVector(spark, sfDir, 0L)
    VectorIndex.appendStore(spark, path,
      Seq((1000001L, 4, qv.toSeq)).toDF("vec_id", "label", "embedding"), gen = 1L)
    val merged = search(path)
    VectorIndex.compactStore(spark, path)
    // no staging debris left behind by a successful swap
    assert(!hfs.exists(new Path(s"$path/vectors_old")))
    assert(!hfs.exists(new Path(s"$path/vectors_compact")))
    assert(search(path) == merged)
    // recoverStore on a healthy store is a no-op
    VectorIndex.recoverStore(spark, path)
    assert(search(path) == merged)
  }
}
