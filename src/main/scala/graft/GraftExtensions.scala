package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring: makes every graft native function available to
  * plain `spark.sql(...)` text in any session configured with
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (the sanctioned library-integration hook — no session code changes, works
  * under spark-submit / Thrift / notebooks). `register(spark)` offers the
  * same surface imperatively for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) => {
          require(es.length == arity, s"$name expects $arity arguments")
          builder(es)
        }))
    }
}

object GraftExtensions {
  /** (name, arity, builder) for every SQL-exposed native expression. */
  val functions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", 2, es => CosineSim(es(0), es(1))),
    ("dot_product", 2, es => DotProduct(es(0), es(1))),
    ("l2_dist", 2, es => L2Distance(es(0), es(1))),
    ("l2_norm", 1, es => L2Norm(es.head)),
    ("l2_normalize", 1, es => L2Normalize(es.head)),
    ("normalized_dot", 2, es => NormalizedDot(es(0), es(1))),
    ("poly_fingerprint", 1, es => PolyFingerprint(es.head)),
    ("minhash_sig", 1, es => MinHashSig(es.head)),
    ("minhash_sig_hashes", 1, es => MinHashSigHashes(es.head)),
    // int-literal parameters are folded at registration (they are plan
    // constants, not data inputs)
    ("poly_combine", 2,
      es => PolyCombine(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    ("hashing_featurize", 2,
      es => HashingFeaturize(es(0), es(1).eval().asInstanceOf[Number].intValue())),
    ("simhash64", 1, es => SimHash64(es.head)),
    // merge pattern/replacement tables are plan constants too (array
    // literals of the separator-wrapped pairs)
    ("apply_bpe_merges", 3,
      es => ApplyBpeMerges(es(0), strArrayConst(es(1)), strArrayConst(es(2)))))

  private def strArrayConst(e: Expression): Array[String] = {
    require(e.foldable,
      "apply_bpe_merges: pattern/replacement tables must be constant " +
        s"(array literals), got non-foldable expression: ${e.sql}")
    val v = e.eval()
    require(v != null,
      "apply_bpe_merges: pattern/replacement tables must be non-null")
    v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString)
  }

  /** Imperative registration into a live session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    VectorFunctions.register(spark)
    TextFunctions.register(spark)
    HashFunctions.register(spark)
  }
}
