package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<float>`.
  *
  * These are the hot path of the engine (the reference's
  * `similarity_search_by_vector_with_score`, app.py:124, scores every stored
  * vector against the query vector). A Scala UDF would deserialize each array
  * into a `Seq[Float]` per row; these expressions read the Tungsten
  * `ArrayData` buffer directly and participate in whole-stage codegen, so the
  * similarity scan stays inside one generated loop per partition.
  *
  * All accumulation is in `double` (sequential order), matching the DuckDB
  * oracle's `CAST(... AS DOUBLE[])` semantics bit-for-bit up to FMA; callers
  * round scores to 4dp for hash parity.
  */
trait FloatVectorBinary extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  /** Java source computing a double from float[] x, float[] y. */
  protected def javaLoop(x: String, y: String, out: String): String
  protected def evalLoop(x: Array[Float], y: Array[Float]): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    evalLoop(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |${javaLoop(x, y, ev.value)}
       """.stripMargin
    })
}

/** dot(x, y): inner-product similarity (langchain_ydb "inner_product"). */
case class DotProduct(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "dot_product"
  override protected def evalLoop(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0; var i = 0
    while (i < x.length) { dot += x(i).toDouble * y(i); i += 1 }
    dot
  }
  override protected def javaLoop(x: String, y: String, out: String): String = {
    val i = s"i_$out"
    s"""
       |double dot_$out = 0.0;
       |for (int $i = 0; $i < $x.length; $i++) {
       |  dot_$out += ((double) $x[$i]) * $y[$i];
       |}
       |$out = dot_$out;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cosine_sim(x, y): cosine similarity (langchain_ydb default strategy). */
case class CosineSim(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "cosine_sim"
  override protected def evalLoop(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < x.length) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def javaLoop(x: String, y: String, out: String): String = {
    val i = s"i_$out"
    s"""
       |double dot_$out = 0.0, nx_$out = 0.0, ny_$out = 0.0;
       |for (int $i = 0; $i < $x.length; $i++) {
       |  double xv = (double) $x[$i]; double yv = (double) $y[$i];
       |  dot_$out += xv * yv; nx_$out += xv * xv; ny_$out += yv * yv;
       |}
       |$out = dot_$out / (Math.sqrt(nx_$out) * Math.sqrt(ny_$out));
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** l2_dist(x, y): euclidean distance (langchain_ydb "euclidean"). */
case class L2Distance(left: Expression, right: Expression) extends FloatVectorBinary {
  override def prettyName: String = "l2_dist"
  override protected def evalLoop(x: Array[Float], y: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { val d = x(i).toDouble - y(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def javaLoop(x: String, y: String, out: String): String = {
    val i = s"i_$out"
    s"""
       |double s_$out = 0.0;
       |for (int $i = 0; $i < $x.length; $i++) {
       |  double d = ((double) $x[$i]) - $y[$i];
       |  s_$out += d * d;
       |}
       |$out = Math.sqrt(s_$out);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** l2_norm(x): vector magnitude, used for store-build normalization. */
/** normalized_dot(x, uq): cosine via the NORMALIZED-STORE formulation —
  * unit(x) · uq where uq is an already-unit double query vector. The
  * accumulation order replicates the oracle's (and the HOF formulation it
  * replaced) bit for bit: n = sqrt(Σ x_i²), then Σ over i of (x_i / n)·uq_i
  * — the per-element division must happen BEFORE the multiply-accumulate
  * (algebraically equal to dot(x, uq)/n, but not in floating point).
  * Replaces a transform/zip_with/aggregate HOF chain that evaluated
  * interpreted lambdas per element (measured ~10× slower than the
  * codegen'd scan at sf1). */
case class NormalizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "normalized_dot"
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val q = b.asInstanceOf[ArrayData].toDoubleArray()
    var n2 = 0.0; var i = 0
    while (i < x.length) { n2 += x(i).toDouble * x(i); i += 1 }
    val n = math.sqrt(n2)
    var s = 0.0; i = 0
    while (i < x.length) { s += (x(i).toDouble / n) * q(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val q = ctx.freshName("q")
      val i = ctx.freshName("i")
      val n2 = ctx.freshName("n2")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |float[] $x = $a.toFloatArray();
         |double[] $q = $b.toDoubleArray();
         |double $n2 = 0.0;
         |for (int $i = 0; $i < $x.length; $i++) { $n2 += ((double) $x[$i]) * $x[$i]; }
         |double $n = Math.sqrt($n2);
         |double $s = 0.0;
         |for (int $i = 0; $i < $x.length; $i++) { $s += (((double) $x[$i]) / $n) * $q[$i]; }
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class L2Norm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "l2_norm"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i).toDouble * x(i); i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |float[] $x = $a.toFloatArray();
         |double $s = 0.0;
         |for (int $i = 0; $i < $x.length; $i++) { $s += ((double) $x[$i]) * $x[$i]; }
         |${ev.value} = Math.sqrt($s);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** l2_normalize(x): unit-length copy of the vector (float out, double math). */
case class L2Normalize(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "l2_normalize"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i).toDouble * x(i); i += 1 }
    val n = math.sqrt(s)
    val out = new Array[Float](x.length)
    i = 0
    while (i < x.length) { out(i) = if (n == 0.0) 0f else (x(i) / n).toFloat; i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  // Interpreted eval only; normalization runs once at store-build, not in the
  // per-query scan loop, so codegen here buys nothing.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("thisExpr", this)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$expr.nullSafeEval($a);"
    })
  }
}

/** Shared kernel for [[SignLshSigs]]: one loop over a precomputed plane
  * table, called identically from interpreted eval and generated code.
  * Plane p's bit is sign(x[pa]) when pc < 0 (axis plane) or
  * sign(x[pa] ± x[pc]) (pairwise plane, op by `ps`) — float arithmetic
  * identical to the SQL formulation it replaces, so the sig values are
  * bit-for-bit unchanged. */
object SignLsh {
  def sigs(emb: ArrayData, bands: Int, bits: Int,
      pa: Array[Int], pc: Array[Int], ps: Array[Byte]): ArrayData = {
    val out = new Array[Int](bands)
    var p = 0
    var b = 0
    while (b < bands) {
      var sig = 0
      var i = 0
      while (i < bits) {
        val a = pa(p)
        val v =
          if (pc(p) < 0) emb.getFloat(a)
          else if (ps(p) > 0) emb.getFloat(a) + emb.getFloat(pc(p))
          else emb.getFloat(a) - emb.getFloat(pc(p))
        if (v > 0) sig |= (1 << i)
        i += 1
        p += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** sign_lsh_sigs(embedding): the banded sign-LSH signature vector as ONE
  * native expression — a loop over a reference-object plane table instead
  * of bands·bits unrolled SQL terms. The unrolled formulation it replaces
  * generated a >64 KB whole-stage method at the size-scaled layouts (the
  * sf100 auto layout is 16 bands × 18 bits = 288 IF terms), which failed
  * Janino and dropped the hottest banding scan to interpreted mode;
  * generated code here is a constant few lines at ANY layout. Plane
  * enumeration (axis planes first, then 45° pairwise planes with the op
  * alternating by coordinate parity) is identical to the SQL version —
  * see the Scaladoc at graft.operators.Dedup#signLshSigExpr's call site
  * — and the float arithmetic is the same one add/sub before the sign
  * test, so every sig bit is unchanged. Assumes dense non-null embedding
  * arrays (the same contract as cosine_sim and every other vector
  * kernel here). */
object SignLshSigs {
  /** The guaranteed-duplicate-free plane budget of the (a, offset)
    * enumeration below: dim axis planes + dim planes per pairwise offset
    * o, collision-free while o and its mirror (dim − o − 2) cannot both
    * be enumerated — i.e. offsets up to (dim − 2)/2 − 1. Beyond that, an
    * unordered pair {a, c} with both coordinates even would enumerate
    * sign(x[a]+x[c]) twice (the op is chosen by a's parity), wasting sig
    * bits; the dim² bound previously permitted that region. */
  def maxDistinctPlanes(dim: Int): Int =
    dim + dim * math.max(0, (dim - 2) / 2)
}

case class SignLshSigs(child: Expression, bands: Int, bitsPerBand: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bitsPerBand <= 31, s"band sigs pack into an int: $bitsPerBand")
  require(bands * bitsPerBand <= SignLshSigs.maxDistinctPlanes(dim),
    s"plane budget ${bands}x$bitsPerBand exceeds the distinct-plane " +
      s"bound ${SignLshSigs.maxDistinctPlanes(dim)} for dim=$dim " +
      "(mirrored same-parity pairs would duplicate hyperplanes)")

  override def prettyName: String = "sign_lsh_sigs"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // the plane table, built once at plan time: pa = first coordinate,
  // pc = partner coordinate (-1 for an axis plane), ps = +1/-1 op
  private val (pa, pc, ps) = {
    val n = bands * bitsPerBand
    val a = new Array[Int](n)
    val c = new Array[Int](n)
    val s = new Array[Byte](n)
    var p = 0
    while (p < n) {
      if (p < dim) { a(p) = p; c(p) = -1; s(p) = 1 }
      else {
        val q = p - dim
        a(p) = q % dim
        val o = q / dim
        c(p) = (a(p) + 1 + o % (dim - 1)) % dim
        s(p) = if (a(p) % 2 == 0) 1 else -1
      }
      p += 1
    }
    (a, c, s)
  }

  override def nullSafeEval(v: Any): Any =
    SignLsh.sigs(v.asInstanceOf[ArrayData], bands, bitsPerBand, pa, pc, ps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paRef = ctx.addReferenceObj("pa", pa, "int[]")
    val pcRef = ctx.addReferenceObj("pc", pc, "int[]")
    val psRef = ctx.addReferenceObj("ps", ps, "byte[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.SignLsh.sigs(
         |  $a, $bands, $bitsPerBand, $paRef, $pcRef, $psRef);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-API surface + SQL registration for the vector expressions. */
object VectorFunctions {
  import Bridge.{col, expr}

  def cosineSim(x: Column, y: Column): Column = col(CosineSim(expr(x), expr(y)))
  def dotProduct(x: Column, y: Column): Column = col(DotProduct(expr(x), expr(y)))
  def l2Dist(x: Column, y: Column): Column = col(L2Distance(expr(x), expr(y)))
  def l2Norm(x: Column): Column = col(L2Norm(expr(x)))
  def l2Normalize(x: Column): Column = col(L2Normalize(expr(x)))
  def normalizedDot(x: Column, uq: Column): Column =
    col(NormalizedDot(expr(x), expr(uq)))
  def signLshSigs(x: Column, bands: Int, bitsPerBand: Int, dim: Int): Column =
    col(SignLshSigs(expr(x), bands, bitsPerBand, dim))

  /** Make the functions callable from `spark.sql(...)` text. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.register(spark, "cosine_sim", es => CosineSim(es(0), es(1)))
    Bridge.register(spark, "dot_product", es => DotProduct(es(0), es(1)))
    Bridge.register(spark, "l2_dist", es => L2Distance(es(0), es(1)))
    Bridge.register(spark, "l2_norm", es => L2Norm(es.head))
    Bridge.register(spark, "l2_normalize", es => L2Normalize(es.head))
    Bridge.register(spark, "normalized_dot", es => NormalizedDot(es(0), es(1)))
  }
}
