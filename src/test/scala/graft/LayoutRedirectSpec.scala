package graft

import org.apache.spark.sql.functions._

/** Pins the `spark.graft.bucketed.db` layout redirect (r16): a table
  * registered in the named db shadows its parquet file, unregistered
  * tables fall through, and the default (conf unset) stays a pure
  * parquet read — so the redirect can never change results, only the
  * physical plan that produces them. */
class LayoutRedirectSpec extends SparkSpec {

  test("bucketed-db redirect shadows registered tables and falls through otherwise") {
    val db = "graft_redirect_spec"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.lineitem")
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem")

      val plainCount = Tables.lineitem(spark, sfDir).count()

      spark.conf.set("spark.graft.bucketed.db", db)
      try {
        // the registered table shadows the file — same rows, and the
        // scan is the catalog relation (bucketed), not the path
        val li = Tables.lineitem(spark, sfDir)
        assert(li.count() == plainCount)
        assert(li.queryExecution.analyzed.toString.contains(db),
          "redirect did not read the catalog table")
        // a table NOT registered in the db falls through to parquet
        assert(Tables.orders(spark, sfDir).count() > 0)
        // the bucketed layout actually removes the orderkey exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try {
          val agg = li.groupBy(col("l_orderkey"))
            .agg(sum(col("l_quantity")).as("q"))
          agg.collect()
          val plan = agg.queryExecution.executedPlan.toString
          assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
            s"orderkey aggregate still shuffles on the bucketed layout:\n$plan")
        } finally {
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        }
      } finally spark.conf.unset("spark.graft.bucketed.db")

      // conf unset: pure parquet read, no catalog reference
      val plain = Tables.lineitem(spark, sfDir)
      assert(!plain.queryExecution.analyzed.toString.contains(db))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $db.lineitem")
      spark.sql(s"DROP DATABASE IF EXISTS $db")
    }
  }
}
