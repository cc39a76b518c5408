package graft

import graft.operators.{Analytics, KnnSearch, RagContext, TextAnalysis}
import org.apache.spark.sql.functions._

/** Specs for the r5 retrieval + event-analytics additions: doc_chunk,
  * bm25_search, hybrid_rrf, events_funnel, events_retention. Each is
  * checked against a brute-force Scala reference computed from the raw
  * tables (not against its own plan). */
class RetrievalFunnelSpec extends SparkSpec {

  test("chunking reassembles every document and respects size/overlap") {
    val size = 120
    val step = 90
    val chunks = TextAnalysis.chunk(spark, sfDir, size = size, overlap = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docs.keySet, "every document chunks")
    docs.foreach { case (id, text) =>
      val cs = chunks(id).sortBy(_._2)
      assert(cs.head._3 == 0L && cs.forall(_._4.length <= size))
      // non-overlap prefixes + the last chunk reassemble the original
      val rebuilt = cs.init.map(_._4.take(step)).mkString + cs.last._4
      assert(rebuilt == text, s"doc $id reassembly")
      // consecutive chunks agree on the overlap region
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.drop(step) == b._4.take(a._4.length - step))
        case _ =>
      }
    }
  }

  test("bm25 matches a brute-force reference ranking") {
    val terms = Seq("spark", "merge", "vector")
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = toks.length.toLong
    val sumdl = toks.map(_._2.length.toLong).sum
    val dfs = terms.map(t => toks.count(_._2.contains(t)).toLong)
    def idf4(df: Long): Double =
      math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 10000 + 0.5) / 10000.0
    val expected = toks.flatMap { case (id, tk) =>
      val dl = tk.length.toLong
      val tfs = terms.map(t => tk.count(_ == t).toLong)
      if (tfs.sum == 0) None
      else Some(id -> terms.indices.map { i =>
        idf4(dfs(i)) * (tfs(i) * 2.2) /
          (tfs(i) + 1.2 * (0.25 + 0.75 * ((dl * n).toDouble / sumdl)))
      }.sum)
    }.map { case (id, s) => (id, math.floor(s * 10000 + 0.5) / 10000.0) }
      .sortBy { case (id, s) => (-s, id) }.take(10).toSeq
    val got = TextAnalysis.bm25(spark, sfDir, terms).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("chunk search matches a pure-Scala hash-and-cosine reference") {
    val M = BigInt(2305843009213693951L)
    def hv(tok: String): Long =
      tok.codePoints().toArray.foldLeft(BigInt(0)) { (acc, c) =>
        (acc * 131 + c) mod M
      }.toLong
    def weights(text: String): Map[Int, Long] =
      "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
        .map(hv)
        .groupBy(h => (h % 64).toInt)
        .map { case (d, hs) =>
          d -> hs.map(h => if ((h / 64) % 2 == 0) 1L else -1L).sum
        }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q = weights(docs(0L))
    val qn2 = q.values.map(w => w * w).sum
    val expected = docs.filter(_._1 != 0L).toSeq.flatMap { case (id, text) =>
      val n = text.length.toLong
      val nChunks = math.max(1L, (n - 30 + 89) / 90)
      (0L until nChunks).map { c =>
        val chunkText = text.slice((c * 90).toInt,
          math.min(n, c * 90 + 120).toInt)
        val w = weights(chunkText)
        val dot = w.map { case (d, x) => x * q.getOrElse(d, 0L) }.sum
        val n2 = w.values.map(x => x * x).sum
        (id, c, n2, math.floor(
          dot / math.sqrt(n2.toDouble * qn2) * 10000 + 0.5) / 10000.0)
      }.filter(_._3 > 0)
    }.sortBy { case (id, c, _, s) => (-s, id, c) }
      .take(10).map { case (id, c, _, s) => (id, c, s) }
    val got = TextAnalysis.chunkSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("rrf fusion equals the hand-fused component rankings") {
    def ranked(rows: Seq[(Long, Double)]): Map[Long, Int] =
      rows.sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val text = ranked(TextAnalysis.textSearch(spark, sfDir, k = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    val vec = ranked(KnnSearch.topK(spark, sfDir, KnnSearch.Cosine, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    val expected = (text.keySet ++ vec.keySet).toSeq.map { id =>
      val s = text.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0) +
        vec.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0)
      id -> math.floor(s * 10000 + 0.5) / 10000.0
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = RagContext.hybridRrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == expected)
    // fusion must actually fuse: some doc in the top-10 from each side
    assert(got.exists { case (id, _) => text.contains(id) })
    assert(got.exists { case (id, _) => vec.contains(id) })
  }

  test("search metrics report the four composed stages with deterministic shape") {
    val rows = RagContext.searchMetrics(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((1, "embed_query"), (2, "search"),
        (3, "build_context"), (4, "build_prompt")))
    assert(rows.forall(_._3 >= 0.0), s"negative stage time: ${rows.toSeq}")
    // k=3 hits, one context row, one prompt
    assert(rows.map(_._4).toSeq == Seq(1L, 3L, 1L, 1L), s"rows_out: ${rows.toSeq}")
    // the search stage must reuse stage 1's vector, so its result equals
    // the one-shot composed search
    val oneShot = TextAnalysis.textSearch(spark, sfDir, k = 3).collect()
    assert(oneShot.length == 3)
  }

  test("funnel counts match a per-user replay of the event order") {
    val events = Tables.events(spark, sfDir)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val perUser = events.groupBy(_._1).map { case (_, es) =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4)
      var (view, click, purch) = (false, false, false)
      ordered.foreach {
        case "view" => view = true
        case "click" if view => click = true
        case "purchase" if click => purch = true
        case _ =>
      }
      (view, click, purch)
    }.toSeq
    val r = Analytics.eventsFunnel(spark, sfDir).collect().head
    assert(r.getLong(0) == perUser.length)
    assert(r.getLong(1) == perUser.count(_._1))
    assert(r.getLong(2) == perUser.count(_._2))
    assert(r.getLong(3) == perUser.count(_._3))
    // funnel monotonicity is implied but assert it explicitly
    assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) >= r.getLong(3))
  }

  test("retention cells match the brute-force cohort matrix") {
    val weeks = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("(unix_micros(ts) div 86400000000) div 7").as("w"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = weeks.groupBy(_._1).map { case (u, ws) =>
      u -> ws.map(_._2).min }
    val expected = weeks
      .map { case (u, w) => (cohort(u), w - cohort(u)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = Analytics.eventsRetention(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // age-0 cell of each cohort is the cohort's size by definition
    cohort.groupBy(_._2).foreach { case (c, us) =>
      assert(got((c, 0L)) == us.size.toLong)
    }
  }
}
