package graft

import graft.functions.Mersenne61
import graft.operators.{Analytics, CorpusOps, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Brute-force references for the r5 pipeline additions: corpus_vocab,
  * corpus_shuffle, text_ppl, events_anomaly. */
class PipelineOpsSpec extends SparkSpec {

  private def docTokens: Seq[(Long, Seq[String])] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq).toSeq

  test("vocabulary equals the brute-force frequency table") {
    val counts = docTokens.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
      .sortBy { case (t, n) => (-n, t) }.take(200)
    val got = CorpusOps.vocab(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == counts)
  }

  test("shuffle assignment is a gapless per-shard permutation matching the rank order") {
    val fps = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        Mersenne61.polyHash(UTF8String.fromString(r.getString(1))))
    val expected = fps
      .map { case (id, fp) =>
        (id, fp % 16, ((fp / 16) % 64, fp / 1024, id))
      }
      .groupBy(_._2).toSeq.flatMap { case (shard, ds) =>
        ds.sortBy(_._3).zipWithIndex
          .map { case ((id, _, _), i) => (id, shard, i.toLong) }
      }.toSet
    val got = CorpusOps.shuffleAssign(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // gapless: every shard's positions are exactly 0..n-1
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3) == (0L until rows.size).toSet)
    }
  }

  test("unigram log-prob scoring matches the brute-force model") {
    val toks = docTokens
    val nTotal = toks.map(_._2.length.toLong).sum
    val counts = toks.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val logq = counts.map { case (t, n) =>
      t -> math.floor(math.log(n.toDouble / nTotal) * 10000 + 0.5).toLong
    }
    val expected = toks.filter(_._2.nonEmpty).map { case (id, ts) =>
      val s = ts.map(logq).sum
      (id, ts.length.toLong, s,
        math.floor(s / (ts.length * 10000.0) * 10000 + 0.5) / 10000.0)
    }.sortBy(_._1)
    val got = TextAnalysis.unigramLogProb(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("q18 returns only qualifying orders, descending by price") {
    val rows = Analytics.q18(spark, sfDir).collect()
      .map(r => (r.getLong(2), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 > 250), "every order must exceed the threshold")
    val prices = rows.map(_._2).toSeq
    assert(prices.zip(prices.drop(1)).forall { case (a, b) => a >= b },
      "descending by total price")
    // qualifying sums agree with a direct aggregate
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      .where(col("q") > 250).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (ok, _, qty) => assert(direct(ok) == qty) }
  }

  test("mm content dedup groups exactly the byte-identical payloads") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expectedKeeper = texts.groupBy(_._2).toSeq
      .flatMap { case (_, ds) =>
        val keep = ds.map(_._1).min
        ds.map { case (id, _) => id -> keep }
      }.toMap
    val got = graft.operators.Multimodal.contentDedup(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expectedKeeper)
  }

  test("exact percentiles match the rank-interpolation definition") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def pct(sorted: Array[Double], p: Double): Double = {
      val rank = p * (sorted.length - 1)
      val lo = rank.toInt
      val g = rank - lo
      val raw =
        if (lo + 1 < sorted.length) (1 - g) * sorted(lo) + g * sorted(lo + 1)
        else sorted(lo)
      math.floor(raw * 10000 + 0.5) / 10000.0
    }
    val expected = ev.groupBy(_._1).map { case (t, vs) =>
      val s = vs.map(_._2).sorted
      t -> (pct(s, 0.5), pct(s, 0.95), pct(s, 0.99))
    }
    val got = Analytics.eventsQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == expected)
  }

  test("anomaly flags are exactly the brute-force z-test outliers") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val expected = byType.toSeq.flatMap { case (_, es) =>
      val vcs = es.map(e => math.floor(e._3 * 100 + 0.5).toLong)
      val n = BigInt(es.length)
      val sv = BigInt(vcs.sum)
      val svv = BigInt(vcs.map(v => v * v).sum)
      es.zip(vcs).collect {
        case ((id, _, _), vc) if {
          val d = n * BigInt(vc) - sv
          d * d > 9 * (n * svv - sv * sv)
        } => id
      }
    }.toSet
    val got = Analytics.eventsAnomaly(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "the z-test should flag the exponential tail")
  }
}
