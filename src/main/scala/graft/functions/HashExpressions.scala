package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash / SimHash primitives for near-duplicate detection at corpus scale.
  *
  * Both are single-pass, map-only native expressions: a 100 TB dedup run
  * computes every signature in one codegen'd scan, and only signatures
  * (128·8 B or 8 B per doc) ever shuffle — never the documents themselves
  * (SURVEY §6). Permutation constants come from a fixed SplitMix64 stream,
  * so signatures are deterministic across runs and executors.
  */
object MinHash {
  final val NumPerms = 128

  private def splitmix(seed: Long): Iterator[Long] = {
    var x = seed
    Iterator.continually {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  // h_i(x) = (a_i * x + b_i) mod (2^61-1), a_i odd-ish nonzero
  private val as: Array[Long] =
    splitmix(42L).map(v => (v & Mersenne61.P) | 1L).take(NumPerms).toArray
  private val bs: Array[Long] =
    splitmix(1337L).map(_ & Mersenne61.P).take(NumPerms).toArray

  /** The 128 (j, a_j, b_j) permutation constants — exposed so the DuckDB
    * oracle can inline the exact same stream as a VALUES table. */
  def perms: Seq[(Int, Long, Long)] =
    (0 until NumPerms).map(j => (j, as(j), bs(j)))

  /** 128-long minhash signature over a set of string shingles. */
  def signature(shingles: ArrayData): ArrayData = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val base = Mersenne61.polyHash(shingles.getUTF8String(i))
      accumulate(sig, base)
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Same signature over pre-hashed (61-bit) shingles — the path that
    * never materializes shingle strings. */
  def signatureFromHashes(hashes: ArrayData): ArrayData = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      accumulate(sig, hashes.getLong(i))
      i += 1
    }
    new GenericArrayData(sig)
  }

  private def accumulate(sig: Array[Long], base: Long): Unit = {
    var j = 0
    while (j < NumPerms) {
      var h = Mersenne61.mulmod(as(j), base) + bs(j)
      if (h >= Mersenne61.P) h -= Mersenne61.P
      if (h < sig(j)) sig(j) = h
      j += 1
    }
  }

  /** Count of equal positions between two signatures (the agreement
    * numerator of the Jaccard estimate); evaluated over the shorter
    * length if they ever differ. */
  def agreement(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** poly_combine(hashes, n): rolling n-gram combination of element hashes —
  * out[i] = Mersenne61 polynomial fold of hashes[i..i+n-1]. Shingle keys
  * computed directly from token hashes, so 5-gram shingle STRINGS are
  * never built (equality of folds ≡ equality of token sequences up to a
  * ~2⁻⁶¹ collision). */
case class PolyCombine(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "poly_combine"
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    PolyCombine.combine(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyCombine.combine($c, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object PolyCombine {
  def combine(hs: ArrayData, n: Int): ArrayData = {
    val m = hs.numElements()
    val out = new Array[Long](math.max(0, m - n + 1))
    var i = 0
    while (i < out.length) {
      var acc = 0L
      var j = 0
      while (j < n) {
        acc = Mersenne61.mulmod(acc, Mersenne61.B) + hs.getLong(i + j)
        if (acc >= Mersenne61.P) acc -= Mersenne61.P
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** minhash_sig(shingles): 128-perm MinHash signature as array<long>. */
case class MinHashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "minhash_sig"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    MinHash.signature(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.signature($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object SimHash {
  /** 64-bit SimHash over token multiset: per token hash, each bit votes
    * +1/-1; fingerprint bit = sign of the vote sum. */
  def fingerprint(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val h = Mersenne61.polyHash(tokens.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

/** simhash64(tokens): 64-bit SimHash fingerprint as long. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "simhash64"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    SimHash.fingerprint(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.fingerprint($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** minhash_sig over pre-hashed shingles (array<long> input). */
case class MinHashSigHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "minhash_sig_hashes"
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    MinHash.signatureFromHashes(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.signatureFromHashes($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** sig_agreement(sig_a, sig_b): the number of equal positions of two
  * equal-length long arrays — the MinHash agreement count behind the
  * unbiased Jaccard estimate. A native codegen'd single pass replacing
  * the interpreted 128-element zip_with/filter lambda chain in the
  * candidate verification (the same HOF→expression upgrade that took
  * knn_cosine_norm from 7.2 to 0.4 s in r5; higher-order functions do
  * not participate in whole-stage codegen). */
/** Membership of a long key in a SORTED bounded key set riding the plan
  * as a reference object — the over-cap dead-bucket sets of
  * [[graft.operators.Dedup.minhashLsh]] and the near-dup ingest gate.
  * Binary search per call: O(log |keys|) against the O(|keys|) per-element
  * scan of `array_contains` over a `typedLit` array, on a path evaluated
  * once per prefix element per band row (degenerate corpora admit
  * thousands of dead keys). The keys never appear as SQL text, so plan
  * size stays constant in |keys| (same rationale as the typedLit object
  * it replaces). */
case class InSortedLongSet(child: Expression, keys: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "in_sorted_long_set"
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    java.util.Arrays.binarySearch(keys, v.asInstanceOf[Long]) >= 0
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("sortedKeys", keys, "long[]")
    defineCodeGen(ctx, ev, c => s"java.util.Arrays.binarySearch($k, $c) >= 0")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sig_agreement"
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    MinHash.agreement(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHash.agreement($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}

object HashFunctions {
  import Bridge.{col, expr}
  def minhashSig(x: Column): Column = col(MinHashSig(expr(x)))
  def minhashSigHashes(x: Column): Column = col(MinHashSigHashes(expr(x)))
  def polyCombine(x: Column, n: Int): Column = col(PolyCombine(expr(x), n))
  def simhash64(x: Column): Column = col(SimHash64(expr(x)))
  def sigAgreement(a: Column, b: Column): Column =
    col(SigAgreement(expr(a), expr(b)))
  /** `keys` MUST be sorted ascending (callers sort once at collect time). */
  def inSortedLongSet(x: Column, keys: Array[Long]): Column =
    col(InSortedLongSet(expr(x), keys))
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.register(spark, "minhash_sig", es => MinHashSig(es.head))
    Bridge.register(spark, "simhash64", es => SimHash64(es.head))
  }
}
