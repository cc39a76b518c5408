package graft

import graft.operators.{CleanCorpus, Dedup}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The production ingest composition (VERDICT r11 item 7): gate-repr →
  * admit → clean, end-to-end, with the member-level pair expansion never
  * materialized at ANY stage.
  *
  *   - At INGEST, incoming documents run through the representative-level
  *     near-dup gate ([[Dedup.nearDupGateRepr]]) — one row per flagged
  *     doc, computed at unique level — and flagged docs are dropped by an
  *     anti-join on that per-doc output (output-linear in flagged docs,
  *     never incoming × corpus-copy-factor).
  *   - At CLEANING, the batch [[CleanCorpus.clean]] anti-joins
  *     [[Dedup.duplicateDocIds]], itself derived from the UNIQUE-level
  *     pair table (≤ one row per member per touching pair, never the
  *     C(copies, 2) expansion).
  *
  * So a pipeline composed of the two keeps the corpus near-dup-free while
  * every intermediate is linear in documents + flagged docs: the gate
  * rejects re-ingested copies before they ever reach the corpus, and the
  * cleaner's dup set over the admitted corpus is exactly what it was
  * before ingest plus nothing — verified here by equality of the cleaned
  * output over the (corpus + admitted) directory with
  * clean(corpus) ∪ admitted.
  */
class IngestComposeSpec extends SparkSpec {

  test("gate-repr admit composes with clean: rejected copies never reach the corpus") {
    import spark.implicits._
    val corpusTexts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(6)
    // incoming: exact re-ingests of corpus docs under new ids (the gate
    // must reject them) + novel docs (must be admitted and survive clean)
    val incoming =
      corpusTexts.zipWithIndex.map { case ((_, t), i) => (920000L + i, t) } ++
        (0 until 4).map(i =>
          (960000L + i, s"qqwzx$i entirely novel payload nothing shared " +
            s"with corpus zebra$i quark$i flux$i jolt$i vex$i nymph$i"))
    val incomingDf = incoming.toSeq.toDF("doc_id", "text")

    // INGEST: one repr row per flagged doc; admit by per-doc anti-join
    val flags = Dedup.nearDupGateRepr(incomingDf, spark, sfDir)
    val admitted = incomingDf.join(flags.select("doc_id"), Seq("doc_id"), "left_anti")
    val admittedIds = admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admittedIds == (0 until 4).map(960000L + _).toSet,
      s"gate admitted the wrong set: $admittedIds")

    // the admitted corpus on disk — what a production ingest would append
    val merged = Files.createTempDirectory("ingest_compose").toString
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .unionByName(admitted)
      .write.mode("overwrite").parquet(s"$merged/documents.parquet")

    // CLEANING over the admitted corpus == clean(corpus) ∪ admitted:
    // the gate already held the near-dups back, so the cleaner's dup set
    // is unchanged and the novel docs ride through
    val cleanedMerged = CleanCorpus.clean(spark, merged)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cleanedCorpus = CleanCorpus.clean(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanedMerged == cleanedCorpus ++ admittedIds,
      s"compose mismatch: extra=${(cleanedMerged -- cleanedCorpus -- admittedIds).take(5)} " +
        s"missing=${((cleanedCorpus ++ admittedIds) -- cleanedMerged).take(5)}")

    // had the copies been admitted instead, clean would have had to drop
    // them itself — the gate and the cleaner enforce the SAME invariant
    val naive = Files.createTempDirectory("ingest_naive").toString
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .unionByName(incomingDf)
      .write.mode("overwrite").parquet(s"$naive/documents.parquet")
    val cleanedNaive = CleanCorpus.clean(spark, naive)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every re-ingested copy is the (strictly greater) duplicate side of
    // its source pair, so none survives the naive path either
    assert(!cleanedNaive.exists(id => id >= 920000L && id < 960000L),
      s"naive clean kept a copy: ${cleanedNaive.filter(_ >= 920000L).take(5)}")
  }
}
