package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

/** Pins the BPE trainer against a reference implementation of the classic
  * algorithm, and — the property the oracle replay rests on — that the
  * separator-delimited `replace` application is EXACTLY the greedy
  * left-to-right scan-with-skip merge, including overlapping `l == r`
  * runs. */
class BpeTrainSpec extends SparkSpec {

  private val us = "\u001f"
  private val wordPattern = "'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+".r

  /** Reference greedy merge: scan left to right, merge a matching pair,
    * skip past it (the merged symbol is not reconsidered as a left
    * element in the same pass). */
  private def scanMerge(
      syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def wrap(syms: Seq[String]): String =
    syms.map(s => us + s + us).mkString

  test("learned merges equal the brute-force reference trainer") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1))
    val expected = referenceMerges(docs.toSeq, 10)
    val got = CorpusOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"merge tables differ:\n got $got\n exp $expected")
  }

  test("trained-merge tokenization equals the scan-with-skip reference counts") {
    import org.apache.spark.sql.functions.col
    val merges = CorpusOps.bpeTrain(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .flatMap { case (id, text) =>
        val words = wordPattern.findAllIn(text.toLowerCase).toSeq
        if (words.isEmpty) None
        else {
          val counts = words.map { w =>
            merges.foldLeft(w.map(_.toString).toVector) {
              case (s, (l, r)) => scanMerge(s, l, r)
            }.length.toLong
          }
          Some((id, words.length.toLong, counts.sum))
        }
      }.sortBy(_._1).toSeq
    val got = CorpusOps.bpeTokenize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == expected)
    // sanity: the learned merges actually compressed the corpus — total
    // merged symbols strictly below the character-level starting point,
    // and never below the pre-token floor
    val totalChars = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
      .map(t => wordPattern.findAllIn(t.toLowerCase).map(_.length).sum).sum
    val totalMerged = got.map(_._3).sum
    val totalPre = got.map(_._2).sum
    assert(totalMerged < totalChars, "merges must compress vs characters")
    assert(totalMerged >= totalPre, "a word can never drop below 1 symbol")
  }

  test("round frame holds ONE merge node regardless of prefix length") {
    import spark.implicits._
    // the constant-plan-depth property: a 200-merge prefix must reach the
    // histogram as a single flat ApplyBpeMerges node, not a 200-deep chain
    val base = Seq((wrap(Vector("a", "b")), 1L)).toDF("syms", "freq")
    val prefix = (1 to 200).map(i => (s"l$i", s"r$i"))
    val frame = CorpusOps.roundFrame(base, prefix)
    val mergeNodes = frame.queryExecution.analyzed.expressions
      .flatMap(_.collect { case e: graft.functions.ApplyBpeMerges => e })
    assert(mergeNodes.length == 1,
      s"expected ONE ApplyBpeMerges node, found ${mergeNodes.length}")
    assert(mergeNodes.head.patterns.length == 200)
  }

  /** Brute-force reference trainer over raw texts (same pre-tokenizer,
    * same greedy argmax, same tie-break) — the oracle both trainer tests
    * pin against. */
  private def referenceMerges(
      texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    var hist: Map[Vector[String], Long] = texts
      .flatMap(t => wordPattern.findAllIn(t.toLowerCase).toSeq)
      .groupBy(identity).view
      .map { case (w, xs) => w.map(_.toString).toVector -> xs.length.toLong }
      .toMap
    (1 to n).map { rank =>
      val counts = hist.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
      hist = hist.toSeq
        .map { case (syms, f) => scanMerge(syms, l, r) -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (rank, l, r, cnt)
    }
  }

  test("trainer survives nMerges >= 200 with checkpointed rematerialization") {
    import spark.implicits._
    // the driver corpus holds only 61 distinct words (~127 possible
    // merges), so a production-shaped run needs a generated
    // large-vocabulary corpus: 400 deterministic syllable words (plus
    // their space-prefixed pre-token variants) ≈ 1200+ learnable merges.
    // 200 rounds with a small checkpoint interval exercises the
    // rematerialization path several times; equality against the
    // brute-force reference pins that checkpoint + flat-prefix rebuild
    // changes nothing.
    val syll = Vector("ba", "ce", "di", "fo", "gu", "ha", "ki", "lo",
      "mu", "ne", "po", "qua", "ri", "so", "tu", "ve", "wi", "xo", "yu", "ze")
    val words = (for { a <- syll; b <- syll } yield a + b).take(400)
    val texts = words.zipWithIndex.map { case (w, i) =>
      ((w + " ") * (1 + (400 - i) / 8)).trim
    }
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = CorpusOps.bpeTrainDocs(docs, "spec|bigvocab", 200,
      rematerializeEvery = 32).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got.length == 200)
    val expected = referenceMerges(texts, 200)
    assert(got == expected,
      s"200-merge run diverged from reference at rank ${
        got.zip(expected).indexWhere { case (a, b) => a != b } + 1}")
  }

  test("replace-chain ≡ scan-with-skip under randomized words and merge chains") {
    // property check of the equivalence the oracle replay rests on: for
    // ANY word over a tiny alphabet (maximizing run/overlap collisions)
    // and ANY chain of merges drawn from symbols the chain itself
    // creates, the separator-delimited replace equals the reference
    // greedy scan. Driven as plain string computation (no Spark) so
    // thousands of cases are cheap; the Spark-side expression is the
    // same `replace` builtin, pinned by the adversarial-runs test below.
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    def replaceChain(syms: Vector[String], l: String, r: String): Vector[String] = {
      val s = syms.map(x => us + x + us).mkString
      val merged = s.replace(us + l + us + us + r + us, us + l + r + us)
      merged.stripPrefix(us).stripSuffix(us).split(us + us).toVector
    }
    val genWord = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.toVector))
    val genCase = for {
      w <- genWord
      nMerges <- Gen.chooseNum(1, 4)
      // candidate pair pool grows as merges create longer symbols
      merges <- Gen.listOfN(nMerges,
        Gen.zip(Gen.oneOf("a", "b", "aa", "ab", "ba", "bb"),
          Gen.oneOf("a", "b", "aa", "ab", "ba", "bb")))
    } yield (w, merges)
    val prop = forAll(genCase) { case (w, merges) =>
      val viaScan = merges.foldLeft(w) { case (s, (l, r)) => scanMerge(s, l, r) }
      val viaReplace = merges.foldLeft(w) { case (s, (l, r)) => replaceChain(s, l, r) }
      Prop(viaScan == viaReplace) :| s"w=$w merges=$merges scan=$viaScan replace=$viaReplace"
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("replace-chain application equals scan-with-skip on adversarial runs") {
    import spark.implicits._
    // the cases where a naive formulation diverges from reference BPE:
    // l == r runs (odd and even), merged-symbol/raw-symbol adjacency,
    // multi-char symbols sharing prefixes
    val merges = Seq(("a", "a"), ("aa", "b"), ("b", "a"))
    val words = Seq(
      Vector("a", "a", "a"), // odd run: [aa, a], the aa must not re-pair
      Vector("a", "a", "a", "a"), // even run: [aa, aa]
      Vector("b", "a", "a", "b"), // mixed: (a,a) then (aa,b)? order matters
      Vector("a", "b", "a"), // (b,a) after earlier merges
      Vector("a", "a", "b"), // [aa, b] -> [aab] via merge 2
      Vector("b", "a"))
    val expected = words.map(w =>
      merges.foldLeft(w) { case (s, (l, r)) => scanMerge(s, l, r) })
    val got = words.map(wrap).toDF("syms")
      .select(CorpusOps.applyMerges(col("syms"), merges).as("merged"))
      .collect().map(_.getString(0))
      .map(s => s.stripPrefix(us).stripSuffix(us).split(us + us).toVector)
    assert(got.toSeq == expected,
      s"replace-chain diverged from scan-with-skip:\n got ${got.toSeq}\n exp $expected")
  }
}
