package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The size-scaled sign-LSH layout (r10): bucket count must track corpus
  * size, and the plane budget must be allowed past the embedding
  * dimensionality (via the deterministic 45° pairwise planes) for that to
  * be possible at all with dim-64 vectors.
  */
class SignLshScaleSpec extends SparkSpec {

  test("auto layout: graded small-corpus contract below 65536, log-scaled above") {
    // at or below 65536 vectors the original graded (8, 8) layout is
    // returned unchanged — the sf0.01 oracle replays exactly that
    assert(Dedup.lshParamsFor(1L, 64) == (8, 8))
    assert(Dedup.lshParamsFor(200L, 64) == (8, 8))
    assert(Dedup.lshParamsFor(65536L, 64) == (8, 8))
    // above: bits ~ log2(n) - 3 (expected bucket occupancy ~8), bands 16
    assert(Dedup.lshParamsFor(65537L, 64) == (16, 14))
    assert(Dedup.lshParamsFor(500000L, 64) == (16, 16)) // the sf10 rehearsal
    assert(Dedup.lshParamsFor(1L << 30, 64) == (16, 24)) // bits capped at 24
    assert(Dedup.lshParamsFor(1L << 40, 64) == (16, 24))
    // monotone: more data never means fewer buckets
    val bucketBits = Seq(1L, 65536L, 65537L, 1L << 20, 1L << 30, 1L << 40)
      .map(n => Dedup.lshParamsFor(n, 64)._2)
    assert(bucketBits == bucketBits.sorted, s"non-monotone: $bucketBits")
  }

  test("small-dim corpora clamp BOTH branches to the distinct-plane budget") {
    // r12 review finding: the small-n branch returned (8, 8) = 64 planes
    // unconditionally, tripping the SignLshSigs require for dim <= 11
    // (dim 8 supports 32 distinct planes). Every returned layout must
    // satisfy the enumeration's budget at any n.
    for (dim <- Seq(4, 6, 8, 11, 12, 16, 64);
         n <- Seq(1L, 65536L, 65537L, 1L << 24)
         // dims too small for the large-n 16-band layout fail loudly
         // (asserted below) rather than return a budget-busting tuple
         if n <= 65536 ||
           graft.functions.SignLshSigs.maxDistinctPlanes(dim) >= 16) {
      val (bands, bits) = Dedup.lshParamsFor(n, dim)
      assert(bands * bits <= graft.functions.SignLshSigs.maxDistinctPlanes(dim),
        s"dim=$dim n=$n -> ($bands, $bits) exceeds the plane budget")
      assert(bits >= 1, s"dim=$dim n=$n -> degenerate $bits")
    }
    // the graded dim-64 contract is untouched by the clamp
    assert(Dedup.lshParamsFor(65536L, 64) == (8, 8))
    // dim 8 small-n: 32 planes / 8 bands = 4 bits
    assert(Dedup.lshParamsFor(1000L, 8) == (8, 4))
    // dims with no valid layout for the branch's band count fail loudly
    // at the parameter level, not at plan time inside SignLshSigs
    intercept[IllegalArgumentException](Dedup.lshParamsFor(1000L, 2))
    intercept[IllegalArgumentException](Dedup.lshParamsFor(1L << 24, 4))
  }

  test("pairwise planes past dim: explicit (16,16) layout still finds exact dups once each") {
    import spark.implicits._
    // 16 bands x 16 bits = 256 planes over dim-64 vectors — impossible
    // with axis planes alone; bands 4..15 are built entirely from the
    // sign(x[a] +/- x[c]) pairwise planes. Five identical vectors (all
    // pairwise cos = 1.0) must pair in ANY layout (identical floats give
    // identical sigs in every band), exactly once each under band
    // ownership; ten background vectors with distinct sign patterns must
    // not survive the 0.99 verify.
    val dim = 64
    val rnd = new scala.util.Random(7)
    val identical = (0L until 5L).map { i =>
      val v = Array.tabulate(dim)(j => if (j % 3 == 0) 1.0f else -0.5f)
      (i, v.toSeq)
    }
    val background = (0 until 10).map { j =>
      (100L + j, Array.fill(dim)(rnd.nextFloat() * 2 - 1).toSeq)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_planes_")
    (identical ++ background).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = Dedup.embeddingNearDupLsh(
      spark, dir.toString, threshold = 0.99, bands = 16, bitsPerBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10,
      s"expected the 10 identical pairs exactly once each, got " +
        s"${rows.length}: ${rows.toSeq.sorted.take(15)}")
    assert(rows.toSet == (for {
      a <- 0L until 5L; b <- (a + 1) until 5L
    } yield (a, b)).toSet)

    // the ingest gate signs incoming vectors with the SAME resolved
    // layout: a copy of vector 0 must flag against the corpus group
    val incoming = Seq((900L, identical.head._2)).toDF("vec_id", "embedding")
    val flags = Dedup.embeddingNearDupGate(
      incoming, spark, dir.toString, threshold = 0.99,
      bands = 16, bitsPerBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flags.length == 5 && flags.forall(f => f._1 == 900L && f._3 == 1.0),
      s"gate flags: ${flags.toSeq.sorted}")
  }

  test("45-degree planes discriminate vectors that axis planes cannot") {
    import spark.implicits._
    // two vectors with IDENTICAL sign patterns coordinate-wise (every
    // axis plane agrees) but opposite pairwise ORDER: ascending vs
    // descending positive ramps. Axis planes: x[j] > 0 for both, so the
    // graded (8, 8) layout — and the axis part of any layout — cannot
    // separate them. Pairwise difference planes sign(x[a] - x[c]): the
    // ramps order every coordinate pair oppositely, so each such plane
    // flips between the two. Probed on the sig expression directly.
    val dim = 64
    val a = Array.tabulate(dim)(j => 1.0f + j)
    val b = Array.tabulate(dim)(j => 64.0f - j)
    val df = Seq((0L, a.toSeq), (1L, b.toSeq)).toDF("vec_id", "embedding")

    def sigsOf(bands: Int, bits: Int): Map[Long, Seq[Int]] =
      df.select(col("vec_id"),
          Dedup.signLshSigExpr(bands, bits, dim).as("sigs"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    val axis = sigsOf(8, 8)
    assert(axis(0L) == axis(1L),
      "axis planes see identical signs in every band")

    val rot = sigsOf(16, 16)
    // bands 0-3 are pure axis planes (64 = dim bits): still identical
    assert(rot(0L).take(4) == rot(1L).take(4))
    // bands 4-15 each hold 8 difference planes: every one must differ
    (4 until 16).foreach { band =>
      assert(rot(0L)(band) != rot(1L)(band),
        s"pairwise band $band failed to separate the ramps: " +
          s"${rot(0L)(band)} == ${rot(1L)(band)}")
    }
  }
}
