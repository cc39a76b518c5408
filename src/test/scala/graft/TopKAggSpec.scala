package graft

import graft.operators.Analytics
import graft.functions.TopKBuffer

class TopKAggSpec extends SparkSpec {

  test("heap buffer keeps the k best with deterministic tie-breaks") {
    val b = new TopKBuffer(3)
    Seq((5.0, 1L), (1.0, 9L), (3.0, 2L), (1.0, 3L), (4.0, 0L), (2.0, 7L))
      .foreach { case (o, i) => b.insert(o, i) }
    assert(b.sorted.toSeq == Seq((1.0, 3L), (1.0, 9L), (2.0, 7L)))
  }

  test("buffer merge equals bulk insert") {
    val xs = (0 until 50).map(i => ((i * 37 % 11).toDouble, i.toLong))
    val (l, r) = xs.splitAt(25)
    val a = new TopKBuffer(5); l.foreach { case (o, i) => a.insert(o, i) }
    val c = new TopKBuffer(5); r.foreach { case (o, i) => c.insert(o, i) }
    a.merge(c)
    val all = new TopKBuffer(5); xs.foreach { case (o, i) => all.insert(o, i) }
    assert(a.sorted.toSeq == all.sorted.toSeq)
  }

  test("TopKAgg plan matches the window-rank formulation row for row") {
    // both formulations return unordered frames (the hash-time sort
    // lives in SparkEntry.hashOrder): pin the compare order here
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("o_custkey", "rank").collect().toSeq
    val agg = sorted(Analytics.topKPerGroup(spark, sfDir))
    val win = sorted(Analytics.topKPerGroupWindow(spark, sfDir))
    assert(agg.nonEmpty)
    assert(agg.map(_.toSeq) == win.map(_.toSeq))
  }
}
