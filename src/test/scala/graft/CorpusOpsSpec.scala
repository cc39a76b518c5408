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

  test("temperature mix matches a driver-side integer reference") {
    import graft.functions.TextFunctions
    val S = 1000000L
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        pmod(TextFunctions.polyFingerprint(col("text")), lit(S)).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nL = docs.groupBy(_._2).map { case (l, d) => l -> d.length.toLong }
    val w = nL.map { case (l, n) => l -> math.sqrt(n.toDouble).toLong }
    val sw = w.values.sum
    val nTarget = docs.length.toLong / 2
    val threshold = nL.map { case (l, n) =>
      l -> math.min(S, (S * nTarget * w(l)) / (sw * n))
    }
    val expected = docs.filter { case (_, l, b) => b < threshold(l) }
      .map(_._1).sorted.toSeq
    val got = CorpusOps.mix(spark, sfDir).collect().map(_.getLong(0))
      .sorted.toSeq // operator output is unordered by design
    assert(got == expected)
    assert(got.nonEmpty && got.size < docs.length, "mix must downsample")
    // the temperature property: rarer languages keep a LARGER fraction
    val kept = CorpusOps.mix(spark, sfDir).collect()
      .groupBy(_.getString(1)).map { case (l, r) => l -> r.length.toLong }
    val fracs = nL.toSeq.sortBy(_._2).map { case (l, n) =>
      (l, n, kept.getOrElse(l, 0L).toDouble / n) }
    val bigFrac = fracs.last._3   // most-resourced language
    val smallFrac = fracs.head._3 // least-resourced language
    assert(smallFrac > bigFrac,
      s"α=1/2 must upweight rare langs: $fracs")
  }

  test("mix never shuffles the corpus — thresholds broadcast back") {
    val plan = CorpusOps.mix(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold join must broadcast:\n$plan")
  }

  test("split is content-keyed: copies co-locate, assignment total and map-only (r13)") {
    import spark.implicits._
    // whitespace/case-variant copies of one text MUST land in the same
    // split (the anti-leakage contract); distinct texts spread by hash
    val dir = java.nio.file.Files.createTempDirectory("graft_split_")
    val base = (0 until 40).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, "  " + base.toUpperCase + "  "),
      (2L, base.replace(" ", "   "))) ++
      (10L until 400L).map(i => (i, (0 until 40).map(j => s"t${i}x$j").mkString(" ")))
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.splitAssign(spark, dir.toString).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size == docs.size, "split must assign every document")
    assert(Set(rows(0L), rows(1L), rows(2L)).size == 1,
      s"copies split apart: ${rows.view.filterKeys(_ < 3).toMap}")
    assert(rows.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(rows.values.count(_ == "train") > rows.size / 2,
      "train must dominate at 1%/1% holdouts")
    // map-only: no exchange anywhere
    val plan = CorpusOps.splitAssign(spark, dir.toString)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split gained a shuffle:\n$plan")
  }
}
