package graft

import graft.functions.Mersenne61
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.unsafe.types.UTF8String

class TextDedupSpec extends SparkSpec {

  test("poly fingerprint matches a BigInt reference fold") {
    val s = "spark vector engine"
    val p = BigInt(Mersenne61.P)
    val expected = s.map(_.toInt).foldLeft(BigInt(0))((h, c) =>
      (h * Mersenne61.B + c) % p)
    assert(BigInt(Mersenne61.polyHash(UTF8String.fromString(s))) == expected)
  }

  test("mersenne mulmod matches BigInt for large operands") {
    val cases = Seq(
      (Mersenne61.P - 1, Mersenne61.P - 1),
      (123456789012345678L, 987654321098765431L % Mersenne61.P),
      (0L, 5L), (1L, Mersenne61.P - 1))
    cases.foreach { case (a, b) =>
      val exp = (BigInt(a) * BigInt(b)) % BigInt(Mersenne61.P)
      assert(BigInt(Mersenne61.mulmod(a, b)) == exp, s"mulmod($a, $b)")
    }
  }

  test("langid covers every document with a deterministic prediction") {
    val rows = TextAnalysis.langid(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getString(6) != null))
  }

  test("minhash-lsh candidates are a superset of high-jaccard truth pairs") {
    val truth = Dedup.ngramJaccard(spark, sfDir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashLsh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(truth.subsetOf(cand),
      s"missed: ${truth.diff(cand)}")
  }

  test("exact dedup keeps every distinct normalized text once") {
    val kept = Dedup.exact(spark, sfDir).collect()
    assert(kept.map(_.getString(1)).distinct.length == kept.length)
    assert(kept.map(_.getLong(2)).sum == 500L)
  }
}
