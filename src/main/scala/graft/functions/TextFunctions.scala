package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Modular arithmetic in the Mersenne field p = 2^61 - 1.
  *
  * Used by the document-fingerprint and MinHash expressions. All ops stay in
  * primitive longs (no BigInt): `x mod p` for a 128-bit product hi·2^64+lo
  * uses 2^61 ≡ 1 and 2^64 ≡ 8 (mod p).
  */
object Mersenne61 {
  final val P = 2305843009213693951L // 2^61 - 1
  final val B = 131L // polynomial base

  /** (a * b) mod p for 0 <= a, b < p. */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & P) + (lo >>> 61) + hi * 8L
    while (r >= P) r -= P
    r
  }

  /** Polynomial rolling hash over the string's Unicode code points:
    * h = fold(h * 131 + codepoint) mod p. Matches the DuckDB oracle's
    * HUGEINT list_reduce fold exactly. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = mulmod(h, B) + cp
      if (h >= P) h -= P
      i += Character.charCount(cp)
    }
    h
  }
}

/** poly_fingerprint(text): 61-bit polynomial rolling-hash document
  * fingerprint (SURVEY §2 `text_fingerprint`). Native expression so the
  * fingerprint pass over a 100 TB corpus is one codegen'd scan — the
  * generated code calls the static hasher on the UTF8String directly, no
  * row materialization. */
case class PolyFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "poly_fingerprint"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    Mersenne61.polyHash(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mersenne61.polyHash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextOps {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.catalyst.InternalRow

  /** Dense hashing-trick accumulator: one O(tokens) imperative pass over
    * the token hashes into `dim` (signed-count, touched-count) slots. The
    * SQL-HOF formulation of this fold is O(tokens·dim) with a fresh
    * dim-array allocation per token — this is the textbook case for a
    * native expression on the hot path. */
  def hashingFeaturize(hs: ArrayData, dim: Int): ArrayData = {
    val w = new Array[Long](dim)
    val n = new Array[Long](dim)
    var i = 0
    val m = hs.numElements()
    while (i < m) {
      val h = hs.getLong(i)
      val d = (h % dim).toInt // poly hashes are nonnegative
      if (((h / dim) & 1L) == 0L) w(d) += 1 else w(d) -= 1
      n(d) += 1
      i += 1
    }
    val out = new Array[Any](dim)
    var j = 0
    while (j < dim) { out(j) = InternalRow(w(j), n(j)); j += 1 }
    new GenericArrayData(out)
  }
}

/** One-pass multi-set marker counter: for N marker word-sets (stopword
  * lists, per-language marker lists), count per set how many tokens of a
  * document belong to it — one hash lookup per token instead of N
  * interpreted `filter(toks, t -> array_contains(set, t))` higher-order
  * passes (Spark HOFs don't participate in whole-stage codegen, and
  * `array_contains` of a literal array is a linear scan per token: the
  * sf100 stage probe measured langid's 5-pass formulation at 12× the cost
  * of the single-pass quality scan over the same corpus). A marker may
  * appear in several sets; each membership counts. The map builds lazily
  * per JVM from the serializable word sets. */
class MarkerLookup(val sets: Array[Array[String]]) extends Serializable {
  import org.apache.spark.sql.catalyst.util.ArrayData
  @transient private lazy val map: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < sets.length) {
      // distinct: a word repeated WITHIN one set must count once per
      // token occurrence, matching the filter/array_contains formulation
      // this class replaces (cross-SET repeats still each count)
      sets(i).distinct.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
      i += 1
    }
    m
  }
  def count(toks: ArrayData): ArrayData = {
    val c = new Array[Int](sets.length)
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val hit = map.get(toks.getUTF8String(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { c(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(c)
  }
}

/** marker_counts(tokens): per-set marker hit counts as array<int>, one
  * codegen'd pass (see [[MarkerLookup]]). The lookup rides as a codegen
  * reference object like the BPE merge table. */
case class MarkerCounts(child: Expression, lookup: MarkerLookup)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "marker_counts"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    lookup.count(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("markerLookup", lookup,
      "graft.functions.MarkerLookup")
    defineCodeGen(ctx, ev, c => s"$l.count($c)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object BpeOps {
  /** Apply a ranked merge table to one separator-delimited symbol
    * string: one `String.replace` pass per merge, in rank order —
    * leftmost-non-overlapping, the exact greedy scan-with-skip
    * semantics BpeTrainSpec pins. Living behind ONE expression node
    * (instead of an nMerges-deep replace column chain) keeps the
    * expression tree flat at production merge counts, where a
    * thousands-deep chain would blow codegen limits. */
  def applyMerges(
      s: UTF8String, pats: Array[String], reps: Array[String]): UTF8String = {
    var str = s.toString
    var i = 0
    while (i < pats.length) { str = str.replace(pats(i), reps(i)); i += 1 }
    UTF8String.fromString(str)
  }
}

/** apply_bpe_merges(syms): the full ranked merge table applied in one
  * codegen'd loop — the serving-side BPE tokenizer step over the wrapped
  * symbol representation. The pattern/replacement arrays ride as a
  * codegen reference object, so the generated code is a constant-size
  * loop regardless of merge count. */
case class ApplyBpeMerges(
    child: Expression, patterns: Array[String], repls: Array[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "apply_bpe_merges"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    BpeOps.applyMerges(a.asInstanceOf[UTF8String], patterns, repls)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("bpePats", patterns, "java.lang.String[]")
    val r = ctx.addReferenceObj("bpeReps", repls, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeOps.applyMerges($c, $p, $r)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** hashing_featurize(hashes): dense array of (signed bucket count, touched
  * count) pairs — the feature-hashing trick as a single codegen'd pass. */
case class HashingFeaturize(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hashing_featurize"
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(a: Any): Any =
    TextOps.hashingFeaturize(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextOps.hashingFeaturize($c, $dim)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextFunctions {
  import Bridge.{col, expr}
  def polyFingerprint(x: Column): Column = col(PolyFingerprint(expr(x)))
  def hashingFeaturize(x: Column, dim: Int): Column =
    col(HashingFeaturize(expr(x), dim))
  def applyBpeMerges(
      x: Column, pats: Array[String], reps: Array[String]): Column =
    col(ApplyBpeMerges(expr(x), pats, reps))
  def markerCounts(x: Column, sets: Seq[Seq[String]]): Column =
    col(MarkerCounts(expr(x), new MarkerLookup(sets.map(_.toArray).toArray)))
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.register(spark, "poly_fingerprint", es => PolyFingerprint(es.head))
}
