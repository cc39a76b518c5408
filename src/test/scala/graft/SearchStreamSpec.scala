package graft

import graft.operators.KnnSearch
import graft.streaming.SearchStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SearchStreamSpec extends SparkSpec {

  test("streaming batch-kNN over a query stream matches the batch plan") {
    // stage the batch query set (vec_id < 5) as a json query stream
    val dir = Files.createTempDirectory("query_stream").toString
    Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .coalesce(1)
      .write.mode("overwrite").json(dir)

    val q = SearchStream.stream(spark, dir, sfDir)
      .writeStream
      .format("memory")
      .queryName("search_stream_spec")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("search_stream_spec")
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val batch = KnnSearch.batchTopK(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
