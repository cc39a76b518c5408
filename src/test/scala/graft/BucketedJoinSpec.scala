package graft

import org.apache.spark.sql.functions._

/** SURVEY §6 promises fact-to-fact joins co-locate via bucketing at scale
  * (lineitem ⋈ orders on the order key without an exchange). This spec
  * proves the mechanism on the real tables: both sides written
  * `bucketBy(orderkey)`, the join plan contains NO shuffle of either fact
  * side, and the result matches the plain shuffle join. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-to-fact join runs without shuffling either side") {
    // tables land in the session's default warehouse (./spark-warehouse);
    // the catalog is in-memory per JVM, so stale directories from an
    // earlier JVM must be removed directly
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$wh/$t"), true)
    }

    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // at real scale neither fact side broadcasts; model that here so the
    // join exercises the bucketed layout instead of a broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, got) =
      try {
        val joined = spark.table("li_bucketed")
          .join(spark.table("ord_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
        val rows = joined.collect() // finalize the adaptive plan
        (joined.queryExecution.executedPlan.toString,
          rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // the join consumes the bucketed layout directly: neither fact side is
    // re-partitioned on the join key (the only exchange in the plan feeds
    // the later groupBy on o_custkey)
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey")
      && !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles a fact side:\n$plan")

    val reference = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
    val want = reference.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty && got.keySet == want.keySet)
    // double sums accumulate in layout-dependent order (sorted bucket files
    // vs shuffle arrival), so values agree to a cent-level tolerance
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 0.05, s"cust $k") }

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }
}
