package graft

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  private def ref(xs: Array[Float], ys: Array[Float]): (Double, Double, Double) = {
    val dot = xs.zip(ys).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val nx = math.sqrt(xs.map(a => a.toDouble * a).sum)
    val ny = math.sqrt(ys.map(a => a.toDouble * a).sum)
    val l2 = math.sqrt(xs.zip(ys).map { case (a, b) =>
      val d = a.toDouble - b.toDouble; d * d
    }.sum)
    (dot, dot / (nx * ny), l2)
  }

  test("cosine/dot/l2 agree with a scala reference on real embeddings") {
    val rows = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < 2).orderBy("vec_id").collect()
    val x = rows(0).getSeq[Float](1).toArray
    val y = rows(1).getSeq[Float](1).toArray
    val (dotR, cosR, l2R) = ref(x, y)

    val got = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === 0)
      .select(
        dotProduct(col("embedding"), typedLit(y)),
        cosineSim(col("embedding"), typedLit(y)),
        l2Dist(col("embedding"), typedLit(y)),
        l2Norm(col("embedding")))
      .head()
    assert(math.abs(got.getDouble(0) - dotR) < 1e-9)
    assert(math.abs(got.getDouble(1) - cosR) < 1e-9)
    assert(math.abs(got.getDouble(2) - l2R) < 1e-9)
    assert(math.abs(got.getDouble(3) - math.sqrt(x.map(a => a.toDouble * a).sum)) < 1e-9)
  }

  test("l2_normalize produces unit vectors") {
    val n = Tables.embeddings(spark, sfDir)
      .select(l2Norm(l2Normalize(col("embedding"))).as("u"))
      .agg(min("u"), max("u")).head()
    assert(math.abs(n.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(n.getDouble(1) - 1.0) < 1e-6)
  }

  test("functions are callable from SQL text after registration") {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_sql_spec")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) c FROM emb_sql_spec LIMIT 1").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
  }
}
