package graft.tools
import graft.Tables
import graft.functions.HashFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val normText = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val fps = Tables.documents(spark, sfDir)
      .withColumn("toks", split(normText, " "))
      .select(col("doc_id"), HashFunctions.simhash64(col("toks")).as("fp"))
    val banded = fps.select(col("doc_id"), col("fp"),
      posexplode(expr("transform(sequence(0, 3), b -> shiftright(fp, b * 16) & 65535L)"))
        .as(Seq("band", "block")))
    val sizes = banded.groupBy("band", "block").count()
      .select(col("count"))
      .groupBy(col("count").as("bucket_size")).agg(count(lit(1)).as("n_buckets"),
        sum(col("count") * (col("count") - 1) / 2).as("pairs"))
      .orderBy(col("bucket_size").desc)
    sizes.show(12, false)
    println("[profile] total pairs: " + banded.groupBy("band", "block").count()
      .agg(sum(col("count") * (col("count") - 1) / 2)).head().get(0))
    spark.stop()
  }
}
