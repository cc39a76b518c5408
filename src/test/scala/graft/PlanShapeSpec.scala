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
}
