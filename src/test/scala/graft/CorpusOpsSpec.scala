package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  test("corpus stats aggregates the whole corpus in one row") {
    val r = CorpusOps.stats(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 500L) // n_docs
    assert(row.getLong(2) > 0L) // total_tokens
    assert(row.getInt(4) <= row.getInt(5)) // min <= max
  }

  test("stratified sample is deterministic and favors the target language") {
    val s1 = CorpusOps.sample(spark, sfDir).collect().map(_.getLong(0)).toSeq
    val s2 = CorpusOps.sample(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "hash-mod sampling must be run-stable")
    val docs = Tables.documents(spark, sfDir)
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = CorpusOps.sample(spark, sfDir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en keeps ~50%, others ~10% — allow generous slack at 500 docs
    val enRate = kept.getOrElse("en", 0L).toDouble / byLang("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate")
    val otherKept = kept.filterNot(_._1 == "en").values.sum.toDouble
    val otherAll = byLang.filterNot(_._1 == "en").values.sum.toDouble
    assert(otherKept / otherAll < 0.25, s"other rate ${otherKept / otherAll}")
  }

  test("sequence packing conserves tokens and fills bins contiguously") {
    val bins = CorpusOps.packSequences(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docTokens = Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("n"))
      .groupBy("lang").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // token conservation per language
    bins.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._4).sum == docTokens(lang), s"tokens lost in $lang")
      // bins are contiguous 0..max (greedy packing leaves no gaps)
      val ids = bs.map(_._2).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1L,
        s"$lang bins not contiguous: ${ids.mkString(",")}")
    }
    assert(bins.nonEmpty)
  }
}
