package graft

import graft.functions.IndexOps
import graft.operators.VectorIndex
import org.apache.spark.sql.functions._

/** The property the whole IVF oracle graduation rests on: fixed-point
  * Lloyd training is bit-deterministic — independent of input
  * partitioning, row order, and accumulation schedule — because every
  * reduction in the loop is an integer sum and every comparison is an
  * integer argmin. A float-sum trainer fails this under repartitioning;
  * the quantized trainer cannot. */
class LloydDeterminismSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"))

  private def flat(m: Array[Array[Float]]): Seq[Float] = m.flatten.toSeq

  test("trained centroids are bit-identical under any partitioning") {
    val base = VectorIndex.trainLloyd(emb)
    val shuffled = VectorIndex.trainLloyd(
      emb.repartition(7, col("vec_id")).sortWithinPartitions(desc("vec_id")))
    val single = VectorIndex.trainLloyd(emb.coalesce(1))
    assert(flat(base) == flat(shuffled),
      "repartitioned training diverged — a non-integer reduction leaked in")
    assert(flat(base) == flat(single))
  }

  test("fused IVF+PQ training is bit-identical to the separate trainers") {
    // the r9 ivf_build fusion: one scan per iteration computes the joint
    // (ivf_cid, sub, pq_cid, dim) partial sums and the driver
    // marginalizes — integer sums re-associated over a partition of the
    // same rows MUST reproduce both models exactly, or every IVF/PQ
    // oracle replay would silently break
    val (fusedC, fusedCb) = VectorIndex.trainLloydPqFused(emb)
    val sepC = VectorIndex.trainLloyd(emb)
    val sepCb = VectorIndex.trainPq(emb)
    assert(flat(fusedC) == flat(sepC),
      "fused centroids diverged from trainLloyd")
    assert(fusedCb.map(_.map(_.toSeq).toSeq).toSeq ==
      sepCb.map(_.map(_.toSeq).toSeq).toSeq,
      "fused PQ codebooks diverged from trainPq")
  }

  test("sampled training equals training on the explicit sample slice") {
    // force the cap below the corpus size so the vec_id-hash sample
    // actually engages (at the default MaxTrain every test SF is under
    // the cap and the sample is the identity)
    val cap = 100
    val n = emb.count()
    val keepMod = VectorIndex.sampleKeepMod(n, cap)
    assert(keepMod > 1, s"cap $cap must engage sampling on $n rows")
    val explicit = emb.where(VectorIndex.samplePredicate(keepMod))
    val nSample = explicit.count()
    assert(nSample > 0 && nSample < n, "sample must be a strict subset")
    assert(nSample <= 2L * cap, s"hash slice far off target: $nSample vs $cap")
    val sampled = VectorIndex.trainLloyd(emb, maxTrain = cap)
    val direct = VectorIndex.trainLloyd(explicit, maxTrain = Int.MaxValue)
    assert(flat(sampled) == flat(direct),
      "sampled training must be exactly training-on-the-sample")
    // and the sample path keeps the partitioning-invariance property
    val shuffled = VectorIndex.trainLloyd(
      emb.repartition(7, col("vec_id")).sortWithinPartitions(desc("vec_id")),
      maxTrain = cap)
    assert(flat(sampled) == flat(shuffled))
  }

  test("quantization is the exact half-up grid on representative values") {
    // float→double is exact, *2^20 shifts the exponent, +0.5/floor is the
    // explicit half-up form: spot-check the corners a binary-vs-decimal
    // confusion would break
    assert(IndexOps.quantize(0.0) == 0L)
    assert(IndexOps.quantize(1.0) == 1048576L)
    assert(IndexOps.quantize(-1.0) == -1048576L)
    // exact .5 ulps round half-up (toward +inf), both signs
    assert(IndexOps.quantize(0.5 / 1048576.0) == 1L)
    assert(IndexOps.quantize(-0.5 / 1048576.0) == 0L)
    assert(IndexOps.quantize(-1.5 / 1048576.0) == -1L)
  }

  test("centroid coordinates survive the float round-trip exactly") {
    // serving persists centroids as float; the oracle contract needs
    // quantize(float(cq/2^20)) == cq for every trained coordinate
    val trained = VectorIndex.trainLloyd(emb)
    trained.flatten.foreach { f =>
      val cq = IndexOps.quantize(f.toDouble)
      assert((cq.toDouble / IndexOps.QScale).toFloat == f)
    }
  }
}
