package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED long arrays via a two-pointer merge — O(|A|+|B|)
  * comparisons, no per-call hash-set allocation (Spark's `array_intersect`
  * builds an OpenHashSet per invocation, which dominates a verification
  * join running millions of pairs). Callers sort once on the build side
  * (`array_sort(collect_set(...))`); inputs that are not sorted produce an
  * undercount, so the sortedness contract is in the name.
  * Null elements are not expected (shingle hashes); they are skipped.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_array_intersect_count requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long xv = $a.getLong($i); long yv = $b.getLong($j);
         |  if (xv < yv) $i++;
         |  else if (xv > yv) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_array_intersect_count"
}

object SortedArrayIntersectCount {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedArrayIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
