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
