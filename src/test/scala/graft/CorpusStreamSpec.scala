package graft

import graft.operators.Dedup
import graft.streaming.CorpusStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CorpusStreamSpec extends SparkSpec {

  test("streaming exact dedup matches the batch keep-set across micro-batches") {
    // stage the documents as multiple json chunks so the aggregation has to
    // merge state across micro-batches (not just within one)
    val dir = Files.createTempDirectory("docs_stream").toString
    Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").json(dir)

    val q = CorpusStream.dedupStream(spark, dir)
      .writeStream
      .format("memory")
      .queryName("corpus_stream_spec")
      .outputMode("complete")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("corpus_stream_spec")
      .select("keep_id", "text_md5", "n_copies").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = Dedup.exact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
