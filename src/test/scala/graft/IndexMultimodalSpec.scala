package graft

import graft.operators.{Multimodal, VectorIndex}
import graft.functions.IndexOps
import org.apache.spark.sql.functions._

class IndexMultimodalSpec extends SparkSpec {

  test("ivf assignment is the true argmin over the trained centroids") {
    val centroids = VectorIndex.trainCentroids(spark, sfDir)
    val sample = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < 20).collect()
    val assigned = VectorIndex.ivfBuild(spark, sfDir)
      .where(col("vec_id") < 20).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    sample.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val best = centroids.indices.minBy { c =>
        centroids(c).zip(v).map { case (a, b) =>
          val d = a.toDouble - b.toDouble; d * d
        }.sum
      }
      assert(assigned(r.getLong(0)) == best)
    }
  }

  test("ivf search returns k rows from probed clusters only") {
    val rows = VectorIndex.ivfSearch(spark, sfDir, k = 10, nprobe = 4).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(2)).distinct.length <= 4)
  }

  test("lsh-probed search returns valid candidates scored like the exact scan") {
    val rows = VectorIndex.lshSearch(spark, sfDir, k = 10).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // every returned score must equal the exact scan's score for that id
    val exact = graft.operators.KnnSearch
      .aboveThreshold(spark, sfDir, -1.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(exact(r.getLong(0)) == r.getDouble(3)))
  }

  test("lsh buckets partition the store") {
    val total = VectorIndex.lshBuckets(spark, sfDir)
      .agg(sum("n_vectors")).head().getLong(0)
    assert(total == 500L)
  }

  test("hyperplane signature is deterministic across calls") {
    val p1 = IndexOps.hyperplanes(16, 64)
    val p2 = IndexOps.hyperplanes(16, 64)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
  }

  test("multimodal decode preserves ids and derives metadata from bytes") {
    val metas = Multimodal.decodeMeta(spark, sfDir).collect()
    assert(metas.length == 500)
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    metas.take(20).foreach { m =>
      val bytes = texts(m.doc_id).getBytes("UTF-8")
      assert(m.n_bytes == bytes.length)
      assert(m.magic == bytes.take(4).map(b => f"$b%02X").mkString)
      assert(m.width == 16 * (1 + bytes.length % 64))
      assert(m.frames == 1 + bytes.length % 30)
    }
  }

  test("stub decoder batches respect the declared batch size") {
    val batch = Array.tabulate(Multimodal.DecodeBatchSize)(i =>
      Multimodal.MediaRecord(i.toLong, Array.fill(i + 1)(7.toByte)))
    val out = Multimodal.stubDecodeBatch(batch)
    assert(out.length == batch.length)
    assert(out.map(_.doc_id).toSeq == batch.map(_.doc_id).toSeq)
  }

  test("frame sampling: uniform indices within range, deduped for short clips") {
    val byDoc = Multimodal.frames(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    val frames = Multimodal.decodeMeta(spark, sfDir).collect()
      .map(m => m.doc_id -> m.frames).toMap
    assert(byDoc.keySet == frames.keySet)
    byDoc.foreach { case (id, rows) =>
      val idxs = rows.map(_._2).toSeq
      assert(idxs.length == idxs.distinct.length)
      assert(idxs.length <= 4 && idxs.nonEmpty)
      assert(idxs.forall(i => i >= 0 && i < frames(id)))
    }
  }
}
