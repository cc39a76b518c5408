package graft

import graft.operators.{CorpusOps, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-13 additions to the training-data cleaning surface: repetition
  * filters (Gopher §A1.1), PII scrubbing, and the duplication profile. */
class CorpusQualitySpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // --- text_repetition ---

  test("repetition stats: known values on a hand corpus, duplicates expand identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rep_")
    Seq(
      (0L, "spam spam spam spam spam spam"), // 6 toks, 1 uniq, top bigram 5/5
      (1L, "alpha beta gamma delta"),        // fully diverse
      (2L, "SPAM  spam Spam spam spam spam"),// normalized copy of doc 0
      (3L, "one")                            // single token: no bigrams
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.repetition(spark, dir.toString).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.size == 4)
    val d0 = r(0L)
    assert(d0.getInt(1) == 6 && d0.getInt(2) == 1)
    assert(d0.getDouble(3) == 0.1667) // 1/6 @4dp
    assert(d0.getLong(4) == 5 && d0.getDouble(5) == 1.0)
    assert(d0.getBoolean(6), "constant doc must flag repetitive")
    val d1 = r(1L)
    assert(d1.getDouble(3) == 1.0 && d1.getLong(4) == 1)
    assert(!d1.getBoolean(6), "diverse doc must not flag")
    // the normalized duplicate gets doc 0's row verbatim (unique-first
    // collapse is over the dedup normalization: case/whitespace folded)
    val d2 = r(2L)
    assert((1 until 7).forall(i => d2.get(i) == d0.get(i)),
      s"duplicate row diverged: $d2 vs $d0")
    // a 1-token doc has no bigrams: ratio 0, count 0, not repetitive via
    // the bigram term — but uniq_ratio 1.0 keeps it clean
    val d3 = r(3L)
    assert(d3.getLong(4) == 0L && d3.getDouble(5) == 0.0 && !d3.getBoolean(6))
  }

  test("repetition on the graded corpus: every doc scored, ratios in range") {
    val rows = TextAnalysis.repetition(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val (u, b) = (r.getDouble(3), r.getDouble(5))
      u > 0 && u <= 1.0 && b >= 0 && b <= 1.0
    })
    // both verdict classes occur on the graded corpus (threshold sanity)
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
  }

  // --- text_pii ---

  test("pii scrub: counts follow the injection arithmetic, redaction replayed byte-exact") {
    val out = TextAnalysis.piiScrub(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 500)
    // independent JVM-side replay of injection + redaction
    val emailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phonePat = "\\+1-[0-9]{3}-[0-9]{4}"
    val ipPat = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val r = out(id)
      assert(r.getInt(1) == (if (id % 2 == 0) 1 else 0), s"n_email @ $id")
      assert(r.getInt(2) == (if (id % 3 == 0) 1 else 0), s"n_phone @ $id")
      assert(r.getInt(3) == (if (id % 5 == 0) 1 else 0), s"n_ip @ $id")
      assert(r.getBoolean(5) == (id % 2 == 0 || id % 3 == 0 || id % 5 == 0))
      val injected =
        (if (id % 5 == 0)
          s"srv ${10 + id % 200}.${id % 250}.${(id / 7) % 250}.${1 + id % 254} "
        else "") + text +
        (if (id % 2 == 0) s" contact user$id@mail${id % 7}.com" else "") +
        (if (id % 3 == 0) " call +1-555-" + "%04d".format(id % 10000) else "")
      val redacted = injected
        .replaceAll(emailPat, "<EMAIL>")
        .replaceAll(phonePat, "<PHONE>")
        .replaceAll(ipPat, "<IP>")
      assert(r.getString(4) == md5hex(redacted), s"redacted_md5 @ $id")
      // the scrubbed text must be PII-free under the same patterns
      Seq(emailPat, phonePat, ipPat).foreach(p =>
        assert(!p.r.findFirstIn(redacted).isDefined, s"residual PII @ $id"))
    }
  }

  // --- dedup_ngram_spans ---

  test("ngram span dedup: known fractions on a hand corpus, within-doc and cross-doc spans") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spans_")
    val span = "w1 w2 w3 w4 w5 w6 w7 w8" // one exact 8-token window
    Seq(
      (0L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),   // 10 toks, 3 windows, all unique
      (1L, s"$span alpha beta"),                 // shares `span` with docs 2,3,4
      (2L, s"$span  ALPHA beta"),                // normalized copy of doc 1
      (3L, s"pre1 pre2 $span post1"),            // cross-doc span, unique edges
      (4L, s"$span mid $span"),                  // within-doc repeat
      (5L, "short doc under eight")              // < 8 tokens: no windows
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.dupSpans(spark, dir.toString).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r.size == 6)
    assert(r(0L) == ((3L, 0L, 0.0)), s"unique doc: ${r(0L)}")
    // docs 1/2 are normalized copies: EVERY window duplicated (w = 2),
    // identical rows — 10 toks → 3 windows
    assert(r(1L) == ((3L, 3L, 1.0)), s"copied doc: ${r(1L)}")
    assert(r(2L) == r(1L))
    // doc 3: 11 toks → 4 windows; only the exact `span` window (position
    // 3) also occurs elsewhere — its shifted windows carry unique edges
    assert(r(3L) == ((4L, 1L, 0.25)), s"cross-doc span: ${r(3L)}")
    // doc 4: 17 toks → 10 windows; the exact `span` window sits at
    // positions 1 and 10 (a within-doc repeat counts as duplication);
    // windows 2-9 all cross `mid` and occur nowhere else
    assert(r(4L) == ((10L, 2L, 0.2)), s"within-doc repeat: ${r(4L)}")
    assert(r(5L) == ((0L, 0L, 0.0)), s"sub-window doc: ${r(5L)}")
  }

  // --- pipeline_clean_full ---

  test("full cleaning pipeline equals the stage-wise composition of its graded parts") {
    import graft.operators.CleanCorpus
    val full = CleanCorpus.cleanFull(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2), r.getString(3)))
      .toMap
    assert(full.nonEmpty)
    // survivors = pipeline_clean's survivors minus the repetitive docs —
    // this also pins the per-row sorted-bigram-run verdict against
    // text_repetition's groupBy formulation on every graded document
    val cleanQ = CleanCorpus.clean(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val repetitive = TextAnalysis.repetition(spark, sfDir)
      .where(col("repetitive")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(full.keySet == cleanQ.keySet -- repetitive)
    // per-doc payloads: quality from the clean stage, scrub columns from
    // the graded text_pii (count sum + identical redaction digest)
    val pii = TextAnalysis.piiScrub(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1) + r.getInt(2) + r.getInt(3), r.getString(4)))).toMap
    full.foreach { case (id, (q, nPii, digest)) =>
      assert(q == cleanQ(id), s"quality @ $id")
      assert((nPii, digest) == pii(id), s"scrub @ $id")
    }
  }

  // --- corpus_dup_profile ---

  test("dup profile: histogram of normalized duplicate-group sizes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dupprof_")
    Seq(
      (0L, "aaa bbb"), (1L, "AAA  bbb"), (2L, "aaa bbb "), // group of 3
      (3L, "ccc"), (4L, "ccc"),                            // group of 2
      (5L, "ddd"), (6L, "eee")                             // two singletons
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.dupProfile(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L, 2L), (2L, 1L, 2L), (3L, 1L, 3L)))
  }

  test("dup profile mass equals the corpus; graded corpus is all-distinct") {
    val rows = CorpusOps.dupProfile(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum == 500L)
    assert(rows.length == 1 && rows.head.getLong(0) == 1L,
      "driver sf0.001 corpus has no exact duplicates")
  }
}
