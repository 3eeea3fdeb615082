package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard storage trade at retrieval scale: a 4× smaller vector column
  * (1 byte/dim vs float32's 4) at ~0.5% relative dot-product error for
  * unit-norm embeddings. The quantized IVF store scans [[Int8Dot]] over
  * these and only touches full-precision vectors for the final rerank.
  *
  * Layout of the binary value: 8 bytes IEEE-754 double scale (big-endian)
  * followed by `dim` signed int8 codes; `code_i = round(v_i / scale)`
  * with `scale = maxAbs(v)/127` (an all-zero vector stores scale 0 and
  * zero codes). Self-describing per row, so vectors of mixed dimension
  * quantize and score without a sidecar.
  */
object Int8Vec {
  def quantize(v: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(v)))

  /** Approximate `dot(a, b)` over two quantized vectors: integer code
    * dot (exact, in long) times the two scales.
    */
  def dot8(a: Column, b: Column): Column =
    ColumnBridge.column(Int8Dot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** JVM-side helpers shared by interpreted eval and generated code. */
  def quantizeArray(vals: Array[Double]): Array[Byte] = {
    var maxAbs = 0.0
    var i = 0
    while (i < vals.length) {
      val a = math.abs(vals(i))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else maxAbs / 127.0
    val out = new Array[Byte](8 + vals.length)
    val bits = java.lang.Double.doubleToLongBits(scale)
    var j = 0
    while (j < 8) {
      out(j) = ((bits >>> (56 - 8 * j)) & 0xff).toByte
      j += 1
    }
    i = 0
    while (i < vals.length) {
      out(8 + i) =
        if (scale == 0.0) 0
        else math.round(vals(i) / scale).toInt.max(-127).min(127).toByte
      i += 1
    }
    out
  }

  def dotQuantized(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length < 8 || b.length < 8) return 0.0
    var sbitsA = 0L; var sbitsB = 0L
    var j = 0
    while (j < 8) {
      sbitsA = (sbitsA << 8) | (a(j) & 0xffL)
      sbitsB = (sbitsB << 8) | (b(j) & 0xffL)
      j += 1
    }
    val sA = java.lang.Double.longBitsToDouble(sbitsA)
    val sB = java.lang.Double.longBitsToDouble(sbitsB)
    val n = math.min(a.length, b.length) - 8
    var acc = 0L // exact: |sum| <= dim * 127^2 << Long.Max
    var i = 0
    while (i < n) {
      acc += a(8 + i).toLong * b(8 + i).toLong
      i += 1
    }
    acc.toDouble * sA * sB
  }
}

/** array<float|double> → binary (8-byte scale + int8 codes). */
case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"int8_quantize requires array<float|double>, got ${other.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      vals(i) =
        if (arr.isNullAt(i)) 0.0
        else if (isFloat) arr.getFloat(i).toDouble
        else arr.getDouble(i)
      i += 1
    }
    Int8Vec.quantizeArray(vals)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val vals = ctx.freshName("vals")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |double[] $vals = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $vals[$i] = $c.isNullAt($i) ? 0.0 : (double) $c.$get($i);
         |}
         |${ev.value} = graft.functions.Int8Vec.quantizeArray($vals);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** binary × binary → double: approximate dot of two quantized vectors. */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"int8_dot requires binary inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int8Vec.dotQuantized(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Int8Vec.dotQuantized($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}
