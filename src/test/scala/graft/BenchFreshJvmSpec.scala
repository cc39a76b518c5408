package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end firing receipt for the automated fresh-JVM re-measure
  * (r19, VERDICT r18 item 2): the r18 mechanism shipped armed but never
  * tripped in a sweep, so its trigger→fork→parse→artifact chain had no
  * execution evidence — exactly the "spec'd but never engaged at grade"
  * class the r17 cap-oracle bug taught us to distrust. This spec drives
  * [[Bench.freshJvmMeasure]] directly on the cheapest query at the
  * smallest SF: the fork must start a real child JVM (classpath
  * resolution included — under sbt layering `java.class.path` may lack
  * the graft classes, the r18 silent-loss mode), run the one-query
  * sweep, write its private SPARK_GRAFT_OUT line, and parse back a
  * plausible wall-clock. */
class BenchFreshJvmSpec extends AnyFunSuite {
  test("freshJvmMeasure forks a child sweep and parses the receipt back") {
    val sec = Bench.freshJvmMeasure("vec_normalize", timeoutMin = 10,
      extraEnv = Map(
        "SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS" -> "4"))
    assert(sec.nonEmpty,
      "the fork → run → parse chain lost the receipt (see the child log " +
        "path on stderr)")
    assert(sec.get > 0.0 && sec.get < 300.0, s"implausible reading: $sec")
  }
}
