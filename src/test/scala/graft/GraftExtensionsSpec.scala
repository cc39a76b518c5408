package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=graft.GraftExtensions exposes native functions to SQL") {
    spark // force the shared session (and its context) first
    val prev = SparkSession.getDefaultSession
    // extensions apply at session construction: clear the default so the
    // builder constructs a fresh session (reusing the context) instead of
    // returning the shared one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions = the same injection point `spark.sql.extensions=
    // graft.GraftExtensions` uses; the static conf itself can't be tested
    // here because the spec reuses the suite's SparkContext
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |       l2_dist(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS d,
          |       poly_fingerprint('ab') AS fp,
          |       simhash64(array('a', 'b')) AS sh,
          |       poly_combine(array(7L, 9L), 2) AS pc,
          |       hashing_featurize(array(5L), 4) AS hf""".stripMargin).head()
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
      assert(r.getLong(2) == 97L * 131L + 98L)
      assert(r.getSeq[Long](4) == Seq(7L * 131L + 9L))
      // hash 5 → slot 1 (5 % 4), sign from bit (5 / 4) & 1 = 1 → −1
      val hf = r.getSeq[org.apache.spark.sql.Row](5)
      assert(hf.length == 4)
      assert(hf(1).getLong(0) == -1L && hf(1).getLong(1) == 1L)
      // the BPE merge applier with plan-constant pattern tables: merge
      // (a,b) over wrapped "a|b" (| = U+001F boundaries)
      val sep = "\u001f"
      val bpe = s.sql(
        s"""SELECT apply_bpe_merges('$sep' || 'a' || '$sep' || '$sep' || 'b' || '$sep',
           |  array('${sep}a$sep${sep}b$sep'), array('${sep}ab$sep')) AS m"""
          .stripMargin).head().getString(0)
      assert(bpe == sep + "ab" + sep, s"got ${bpe.replace(sep, "|")}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
