package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bucket index of a double against a SORTED cutpoint array: the number
  * of cutpoints ≤ the value, i.e. `cutpoints` splits the line into
  * `cutpoints.length + 1` buckets `0..length`. Used by the Z-order
  * layout writer to discretize each clustering column into its
  * quantile bucket.
  *
  * Why a native expression: the search must run once per row per
  * clustering column at write time. A higher-order `aggregate` over a
  * literal array is interpreted AND linear in the cutpoint count; this
  * expression is an `Arrays.binarySearch` in both codegen and
  * interpreted paths, and the cutpoint array rides along as a codegen
  * reference object instead of being re-materialized per row.
  */
case class SortedBucket(child: Expression, cutpoints: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_bucket requires a double input, got " +
          child.dataType.catalogString)

  override protected def nullSafeEval(v: Any): Any =
    SortedBucket.bucketOf(cutpoints, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cuts = ctx.addReferenceObj("cutpoints", cutpoints, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = java.util.Arrays.binarySearch($cuts, $v);
         |${ev.value} = $idx >= 0 ? $idx + 1 : -($idx + 1);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedBucket = copy(child = newChild)

  override def prettyName: String = "graft_sorted_bucket"
}

object SortedBucket {
  private[graft] def bucketOf(cuts: Array[Double], v: Double): Int = {
    val idx = java.util.Arrays.binarySearch(cuts, v)
    if (idx >= 0) idx + 1 else -(idx + 1)
  }

  /** Column form: bucket of `c` (double) in the sorted `cutpoints`. */
  def apply(c: Column, cutpoints: Array[Double]): Column =
    ColumnBridge.column(
      SortedBucket(ColumnBridge.expression(c), cutpoints))
}
