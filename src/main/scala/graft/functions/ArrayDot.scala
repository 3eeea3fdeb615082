package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Σ aᵢ·bᵢ over two float/double arrays, accumulated LEFT-TO-RIGHT in
  * double — the one arithmetic contract every SQL engine's sequential dot
  * product shares, so results are bitwise comparable with the DuckDB
  * oracle.
  *
  * Why a native Catalyst expression and not `aggregate(zip_with(...))` or
  * an unrolled `element_at` sum: higher-order-function lambdas are
  * evaluated interpreted (~50× slower in a pair join), and a dim-unrolled
  * expression tree blows past codegen method limits — inside a
  * BroadcastNestedLoopJoin condition it silently falls back to the
  * interpreted evaluator (measured 66 s for 2M pairs at sf0.1). This
  * expression generates a tight `for` loop (`doGenCode`), stays inside
  * whole-stage codegen and inside join-condition predicates, and its
  * interpreted fallback (`nullSafeEval`) is a plain JVM loop.
  *
  * Null elements are treated as 0 (embeddings contract: no null elements).
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot requires array<float|double> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (xf, yf) = (isFloat(left), isFloat(right))
    var s = 0.0d
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0d
        else if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0d
        else if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    def get(arr: String, i: String, float: Boolean): String =
      if (float) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val (lf, rf) = (isFloat(left), isFloat(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $a.isNullAt($i) ? 0.0 : ${get(a, i, lf)};
         |  double yv = $b.isNullAt($i) ? 0.0 : ${get(b, i, rf)};
         |  $s += xv * yv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_array_dot"
}

object ArrayDot {
  /** Column form: Σ aᵢ·bᵢ in double, sequential. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
