package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  test("marker_counts equals the per-set filter/array_contains formulation") {
    import spark.implicits._
    // sets deliberately OVERLAP ("the" in both 0 and 2) and tokens repeat —
    // each membership of each occurrence must count, exactly like
    // size(filter(toks, t -> array_contains(set, t))) per set
    val sets: Seq[Seq[String]] = Seq(
      Seq("the", "a", "and"),
      Seq("der", "die"),
      Seq("the", "zebra"))
    val docs = Seq(
      (1L, Seq("the", "the", "a", "zebra", "x")),
      (2L, Seq("der", "die", "der")),
      (3L, Seq.empty[String]),
      (4L, Seq("nothing", "matches", "here"))).toDF("id", "toks")
    val native = docs.select(col("id"),
      TextFunctions.markerCounts(col("toks"), sets).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = docs.select(col("id") +: sets.zipWithIndex.map { case (s, i) =>
        val arr = s.map(w => s"'$w'").mkString("array(", ", ", ")")
        expr(s"size(filter(toks, t -> array_contains($arr, t)))").as(s"c_$i")
      }: _*)
      .collect().map(r => r.getLong(0) -> (1 to sets.length).map(r.getInt)).toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, mc) =>
      assert(mc == hof(id), s"doc $id: native $mc vs hof ${hof(id)}")
    }
    assert(native(1L) == Seq(3, 0, 3)) // "the" twice + "a"; "the" twice + "zebra"
  }

  test("a word repeated WITHIN one marker set counts once per token occurrence") {
    import spark.implicits._
    // r12 review finding: the lookup map appended the set index once per
    // in-set occurrence, doubling counts vs the filter/array_contains
    // formulation (array_contains is a membership test — repeats in the
    // literal array change nothing)
    val sets: Seq[Seq[String]] = Seq(Seq("the", "the", "a"), Seq("the"))
    val mc = Seq((1L, Seq("the", "the", "a")))
      .toDF("id", "toks")
      .select(TextFunctions.markerCounts(col("toks"), sets))
      .collect()(0).getSeq[Int](0)
    assert(mc == Seq(3, 2), s"in-set repeat double-counted: $mc")
  }

  test("langid over the corpus is unchanged by the single-pass rewrite") {
    // brute-force replay of the ORIGINAL 5-pass formulation on the spec
    // corpus must match the shipped single-pass langid exactly
    val base = Tables.documents(spark, sfDir)
      .withColumn("toks",
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
    val legacy = graft.operators.TextAnalysis.langMarkers
      .foldLeft(base) { case (df, (lang, markers)) =>
        val arr = markers.map(w => s"'$w'").mkString("array(", ", ", ")")
        df.withColumn(s"c_$lang",
          size(expr(s"filter(toks, t -> array_contains($arr, t))")))
      }
      .select(col("doc_id"), col("c_en"), col("c_de"), col("c_fr"),
        col("c_es"), col("c_zh"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val current = graft.operators.TextAnalysis.langid(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    assert(current.keySet == legacy.keySet)
    current.foreach { case (id, c) =>
      assert(c == legacy(id), s"doc $id: $c vs legacy ${legacy(id)}")
    }
  }
}
