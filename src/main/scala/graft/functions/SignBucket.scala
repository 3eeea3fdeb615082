package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Random-hyperplane sign bucket: bit j of the result is set iff
  * Σᵢ rⱼᵢ·vᵢ > 0, with rⱼᵢ ∈ {−1,+1} derived from
  * `XXH64.hashInt((planeOffset + j)·dim + i, 42)` — deterministic and
  * data-independent, the same plane family the original
  * `aggregate(zip_with(...))` column built (so buckets are bit-identical
  * to the pre-codegen path for full-length vectors). `planeOffset` selects
  * an independent band of hyperplanes (band k of b-bit buckets passes
  * `k·b`), which is what banded OR-amplified blocking needs.
  *
  * Why a native expression: the HOF form is evaluated interpreted — fine
  * once per row, ~50× too slow when the bucketing feeds a self-join and
  * the optimizer inlines it back into the join condition (the reason
  * cosineNearDupPairs had to cache its bucketed side). This generates a
  * bits×dim fused loop over a plane matrix embedded as a reference object,
  * stays inside whole-stage codegen, and needs no compensating cache.
  *
  * Null elements count 0 (embeddings contract: no null elements); a
  * vector shorter than `dim` uses only its own elements.
  */
case class SignBucket(child: Expression, dim: Int, bits: Int,
                      planeOffset: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _)
          if bits >= 0 && bits <= 60 && dim > 0 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bucket requires array<float|double> and 0<=bits<=60, got " +
            s"${child.dataType.catalogString}, bits=$bits, dim=$dim")
    }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** bits×dim plane matrix, row-major: planes(j*dim + i) = ±1. */
  @transient private lazy val planes: Array[Double] = {
    val m = new Array[Double](bits * dim)
    var j = 0
    while (j < bits) {
      var i = 0
      while (i < dim) {
        m(j * dim + i) =
          if ((graft.core.XXH64.hashInt((planeOffset + j) * dim + i, 42L)
            & 1L) == 1L) 1.0d else -1.0d
        i += 1
      }
      j += 1
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val f = isFloat
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var s = 0.0d
      val base = j * dim
      var i = 0
      while (i < n) {
        val x = if (v.isNullAt(i)) 0.0d
          else if (f) v.getFloat(i).toDouble else v.getDouble(i)
        s += planes(base + i) * x
        i += 1
      }
      if (s > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("sbPlanes", planes, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bkt = ctx.freshName("bkt")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long $bkt = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  double $s = 0.0;
         |  int ${s}_base = $j * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double ${s}_x = $v.isNullAt($i) ? 0.0 : (double) $v.$get($i);
         |    $s += $planesRef[${s}_base + $i] * ${s}_x;
         |  }
         |  if ($s > 0) $bkt |= (1L << $j);
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SignBucket = copy(child = newChild)

  override def prettyName: String = "graft_sign_bucket"
}

object SignBucket {
  /** Column form: 64-bit sign bucket of `vec` under hyperplane band
    * `planeOffset/bits`.
    */
  def apply(vec: Column, dim: Int, bits: Int, planeOffset: Int = 0): Column =
    ColumnBridge.column(
      SignBucket(ColumnBridge.expression(vec), dim, bits, planeOffset))
}
