package graft

import graft.operators.{KnnSearch, TextAnalysis, VectorIndex}

/** Pins the executed-plan shape of the scan-dominated queries: these must
  * stay shuffle-free (per-partition top-k heaps + driver merge), because a
  * regression that introduces an Exchange here would still pass the value
  * oracles while destroying the 100 TB profile. */
class PlanShapeSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("exact knn is a single scan + TakeOrdered: no exchange, no join") {
    val plan = executedPlan(KnnSearch.topK(spark, sfDir, KnnSearch.Cosine))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"knn plan gained a shuffle:\n$plan")
  }

  test("quantized knn is two stacked TakeOrdered passes with no exchange") {
    val plan = executedPlan(VectorIndex.quantizedSearch(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"quantized plan gained a shuffle:\n$plan")
  }

  test("text search is map-only: dense featurize + TakeOrdered, no exchange") {
    val plan = executedPlan(TextAnalysis.textSearch(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"text_search plan gained a shuffle:\n$plan")
  }

  test("chunk search fuses chunk+featurize+score into one scan: no exchange") {
    val plan = executedPlan(TextAnalysis.chunkSearch(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"),
      s"chunk_search plan gained a shuffle:\n$plan")
  }

  test("bm25 scoring is a map-only scan over literal terms: no exchange, no join") {
    val plan = executedPlan(TextAnalysis.bm25(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), s"bm25 plan gained a shuffle:\n$plan")
    assert(!plan.contains("Join"), s"bm25 corpus side must not join:\n$plan")
  }

  test("corpus_pack cumsum is a distributed prefix sum, not a per-language window") {
    // the r4 rework (VERDICT r3 item 1): the per-document cumulative sum
    // must be windowed by (lang, shard) — bounded state per window
    // partition — with the shard offsets broadcast back. A regression to
    // Window.partitionBy(lang) would serialize each language's whole
    // corpus through one task at 100 TB.
    val plan = executedPlan(graft.operators.CorpusOps.packSequences(spark, sfDir))
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(winSpecs.nonEmpty, s"no window found:\n$plan")
    assert(winSpecs.exists(s => s.contains("lang") && s.contains("shard")),
      s"per-doc cumsum window must be keyed by (lang, shard):\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"shard offsets should broadcast back onto the triples:\n$plan")
  }
}
