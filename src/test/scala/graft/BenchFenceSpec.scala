package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pair-mode fence's scale-factor parsing (ADVICE r14): the
  * fence keys off the sf in the data directory's basename, and a dataset
  * in a directory carrying NO parseable sf must FAIL FAST rather than
  * parse as 0.0 — 0.0 ≤ 1 would silently unfence the output-bound pair
  * expansions (dedup_simhash emitted ~214B rows at sf100). No Spark
  * session needed; this is pure path parsing. */
class BenchFenceSpec extends AnyFunSuite {

  test("sfOf parses the sf out of standard testdata and replica paths") {
    assert(Bench.sfOf("/root/testdata/sf0.001") == 0.001)
    assert(Bench.sfOf("/root/testdata/sf0.1") == 0.1)
    assert(Bench.sfOf("/tmp/sf100") == 100.0)
    // fence boundary: sf1 is NOT fenced (> 1.0 is), sf10/sf100 are
    assert(Bench.sfOf("/tmp/sf1") == 1.0)
    assert(Bench.sfOf("/tmp/sf10") == 10.0)
  }

  test("an sf-less directory fails fast instead of unfencing pair modes") {
    // this test environment does not set SPARK_GRAFT_UNFENCE (the escape
    // hatch that makes an sf-less dir legal), so parsing must throw
    assume(!sys.env.contains("SPARK_GRAFT_UNFENCE"))
    val e = intercept[IllegalArgumentException](Bench.sfOf("/data/corpus"))
    assert(e.getMessage.contains("SPARK_GRAFT_UNFENCE"))
    intercept[IllegalArgumentException](Bench.sfOf("/data/prod_2026"))
  }

  test("the fence decision only needs an sf when a pair query is a candidate (r16)") {
    assume(!sys.env.contains("SPARK_GRAFT_UNFENCE"))
    val pair = Set("dedup_simhash", "dedup_embedding")
    val others = Set("q1_agg", "text_tokens")
    // a sweep restricted to non-pair queries runs fine on an sf-less dir
    assert(Bench.fencedQueries("/data/corpus", others, Set.empty, others)
      .isEmpty)
    // skip removing every pair query also needs no sf
    assert(Bench.fencedQueries("/data/corpus", others ++ pair, pair,
      Set.empty).isEmpty)
    // a pair candidate on an sf-less dir still fails fast
    intercept[IllegalArgumentException](
      Bench.fencedQueries("/data/corpus", others ++ pair, Set.empty,
        Set.empty))
    // parseable dirs: fence above sf1, not at or below it
    assert(Bench.fencedQueries("/tmp/sf100", others ++ pair, Set.empty,
      Set.empty) == pair)
    assert(Bench.fencedQueries("/tmp/sf1", others ++ pair, Set.empty,
      Set.empty).isEmpty)
    // an explicit only naming a pair query is never fenced
    assert(Bench.fencedQueries("/tmp/sf100", pair, Set.empty,
      Set("dedup_simhash")) == Set("dedup_embedding"))
  }

  test("refTimes parses a Bench artifact line; rejects shapes without queries") {
    val f = java.nio.file.Files.createTempFile("graft_ref_", ".json")
    java.nio.file.Files.writeString(f,
      """{"metric":"total","value":9.9,"unit":"sec",""" +
        """"queries":{"q1_agg":5.4577,"q3_join":29.21},"sf":"/tmp/sf100"}""")
    assert(Bench.refTimes(f.toString) ==
      Map("q1_agg" -> 5.4577, "q3_join" -> 29.21))
    val bad = java.nio.file.Files.createTempFile("graft_ref_bad_", ".json")
    java.nio.file.Files.writeString(bad, """{"metric":"total","value":1.0}""")
    val e = intercept[IllegalArgumentException](Bench.refTimes(bad.toString))
    assert(e.getMessage.contains("queries"))
    // malformed shapes fail as loudly as missing ones (r17, ADVICE r16):
    // a non-object 'queries' used to yield an empty map (ref-retry
    // silently disarmed), non-numeric values coerced to 0.0 (every query
    // looks like a >2x regression and the whole sweep re-runs)
    val nonObj = java.nio.file.Files.createTempFile("graft_ref_bad_", ".json")
    java.nio.file.Files.writeString(nonObj,
      """{"metric":"total","queries":[1,2,3]}""")
    intercept[IllegalArgumentException](Bench.refTimes(nonObj.toString))
    val nonNum = java.nio.file.Files.createTempFile("graft_ref_bad_", ".json")
    java.nio.file.Files.writeString(nonNum,
      """{"metric":"total","queries":{"q1_agg":"failed"}}""")
    val en = intercept[IllegalArgumentException](Bench.refTimes(nonNum.toString))
    assert(en.getMessage.contains("q1_agg"))
  }

  test("refFloor resolves per SF: env wins, then the per-SF floor file, then 2.0") {
    // no env in the test JVM: the per-SF file (written relative to CWD,
    // as Bench runs) is read for a matching tag, 2.0 otherwise
    val dir = java.nio.file.Paths.get("bench")
    val probe = dir.resolve("noise_floor_sf987.json")
    assert(!java.nio.file.Files.exists(probe), "stale test floor file")
    assert(Bench.refFloor("/tmp/sf987") == 2.0)
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(probe, """{"floor_sec":4.5}""")
    try assert(Bench.refFloor("/tmp/sf987") == 4.5)
    finally java.nio.file.Files.delete(probe)
    // the dot-stripping tag rule: sf0.1 -> sf01
    val probe01 = dir.resolve("noise_floor_sf01.json")
    if (java.nio.file.Files.exists(probe01)) {
      val rec = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(probe01.toFile).get("floor_sec").asDouble()
      assert(Bench.refFloor("/x/sf0.1") == rec)
    }
  }

  test("refRetryCandidates: swing hits retry, stable heavy tail and sub-floor noise don't") {
    val ref = Map("q1_agg" -> 6.0, "q5_join" -> 90.0, "store_get" -> 0.3)
    val measured = Map(
      "q1_agg" -> 31.0, // 5× its own reference — the swing-hit shape
      "q5_join" -> 95.0, // heavy but stable round-over-round: no retry
      "store_get" -> 1.9, // 6× reference but under the noise floor
      "knn_graph" -> 50.0) // no reference entry: nothing to compare
    assert(Bench.refRetryCandidates(measured, ref, 2.0, 2.0) == Seq("q1_agg"))
    // the factor is a real knob: at 4× the q1_agg hit still trips, at 6× not
    assert(Bench.refRetryCandidates(measured, ref, 4.0, 2.0) == Seq("q1_agg"))
    assert(Bench.refRetryCandidates(measured, ref, 6.0, 2.0).isEmpty)
  }
}
