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

object TextFunctions {
  import Bridge.{col, expr}
  def polyFingerprint(x: Column): Column = col(PolyFingerprint(expr(x)))
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.register(spark, "poly_fingerprint", es => PolyFingerprint(es.head))
}
