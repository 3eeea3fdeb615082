package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product quantization (PQ) for embedding columns — the storage trade
  * one tier beyond int8: the vector splits into `m` subvectors, each
  * snapped to its nearest of `k` learned sub-centroids, so a row stores
  * just `m` code bytes (8 bytes for a 64-dim vector vs 256 float32
  * bytes — a 32× cut, or 9× below the int8 layout). Scoring against a
  * probe is ADC (asymmetric distance computation): the probe precomputes
  * a (m × k) table of sub-dot-products once, and each candidate's
  * approximate dot product is m table lookups — no float math per
  * candidate at all. Lossier than int8, which is exactly why the IVF-PQ
  * probe keeps the same shortlist-then-exact-rerank shape.
  *
  * Public design: Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search" (TPAMI 2011) — the IVFADC system; codebooks
  * are trained on a bounded sample (the standard recipe: they are tiny
  * and generalize).
  *
  * Reference anchor: the reference exposes no vector search; this is
  * part of the training-data-pipeline surface (SURVEY.md §2 additions).
  */
object PqVec {

  /** Flat codebook layout: `flat((j*k + c)*subDim + d)` = coordinate `d`
    * of centroid `c` of subspace `j`.
    */
  final case class Books(m: Int, k: Int, subDim: Int, flat: Array[Double])
      extends Serializable

  /** Train per-subspace codebooks with Lloyd's k-means on a driver-side
    * sample. Deterministic: strided seeding, fixed iteration count;
    * empty clusters keep their previous centroid. `k` is capped at the
    * sample size (codes stay bytes: k ≤ 256).
    */
  def train(samples: Array[Array[Double]], m: Int, k0: Int = 256,
            iters: Int = 8): Books = {
    require(samples.nonEmpty, "pq train: empty sample")
    val dim = samples(0).length
    require(dim % m == 0, s"pq train: dim $dim not divisible by m=$m")
    require(k0 >= 1 && k0 <= 256, "pq train: k must be in [1, 256]")
    val subDim = dim / m
    val k = math.min(k0, samples.length)
    val flat = new Array[Double](m * k * subDim)
    val assign = new Array[Int](samples.length)
    var j = 0
    while (j < m) {
      val off = j * subDim
      // strided seeding over the sample (spread, deterministic)
      var c = 0
      while (c < k) {
        val s = samples((c.toLong * samples.length / k).toInt)
        var d = 0
        while (d < subDim) {
          flat((j * k + c) * subDim + d) = s(off + d); d += 1
        }
        c += 1
      }
      var it = 0
      while (it < iters) {
        // assignment: nearest sub-centroid by L2
        var i = 0
        while (i < samples.length) {
          val v = samples(i)
          var best = 0; var bestD = Double.MaxValue
          var cc = 0
          while (cc < k) {
            var dist = 0.0
            var d = 0
            while (d < subDim) {
              val diff = v(off + d) - flat((j * k + cc) * subDim + d)
              dist += diff * diff; d += 1
            }
            if (dist < bestD) { bestD = dist; best = cc }
            cc += 1
          }
          assign(i) = best
          i += 1
        }
        // update: mean of assigned; empty clusters keep the old centroid
        val sums = new Array[Double](k * subDim)
        val counts = new Array[Int](k)
        i = 0
        while (i < samples.length) {
          val a = assign(i)
          counts(a) += 1
          var d = 0
          while (d < subDim) { sums(a * subDim + d) += samples(i)(off + d); d += 1 }
          i += 1
        }
        var cc = 0
        while (cc < k) {
          if (counts(cc) > 0) {
            var d = 0
            while (d < subDim) {
              flat((j * k + cc) * subDim + d) = sums(cc * subDim + d) / counts(cc)
              d += 1
            }
          }
          cc += 1
        }
        it += 1
      }
      j += 1
    }
    Books(m, k, subDim, flat)
  }

  /** PQ-encode one vector: per subspace the nearest (L2) sub-centroid's
    * index, one unsigned byte each. Static so generated code can call it.
    */
  def encodeFlat(vals: Array[Double], flat: Array[Double], m: Int,
                 k: Int): Array[Byte] = {
    val subDim = vals.length / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val off = j * subDim
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val diff = vals(off + d) - flat((j * k + c) * subDim + d)
          dist += diff * diff; d += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      out(j) = (best & 0xff).toByte
      j += 1
    }
    out
  }

  /** Probe-side ADC lookup table, flattened (m × k): entry `j*k + c` is
    * `dot(q_sub_j, centroid(j, c))`; a candidate's approximate dot is
    * then `Σ_j lut(j*k + code(j))`.
    */
  def lut(q: Array[Double], books: Books): Array[Double] = {
    val out = new Array[Double](books.m * books.k)
    var j = 0
    while (j < books.m) {
      val off = j * books.subDim
      var c = 0
      while (c < books.k) {
        var acc = 0.0
        var d = 0
        while (d < books.subDim) {
          acc += q(off + d) * books.flat((j * books.k + c) * books.subDim + d)
          d += 1
        }
        out(j * books.k + c) = acc
        c += 1
      }
      j += 1
    }
    out
  }

  /** ADC sum over a code row and a probe table; `k = lut.length / m`
    * falls out of the shapes, so mixed stores never misindex. Static for
    * generated code; reads the lut column's ArrayData in place — no
    * per-row array copy in the candidate-scan hot path.
    */
  def adcSum(code: Array[Byte], lut: ArrayData): Double = {
    if (code.length == 0) return 0.0
    val k = lut.numElements() / code.length
    var acc = 0.0
    var j = 0
    while (j < code.length) {
      acc += lut.getDouble(j * k + (code(j) & 0xff))
      j += 1
    }
    acc
  }

  /** Column form of [[encodeFlat]] (codegen'd; the codebook rides along
    * as a referenced object, not a per-row literal).
    */
  def encode(v: Column, books: Books): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), books))

  /** Column form of [[adcSum]]: `pq_adc(codeCol, lutCol)`. */
  def adc(code: Column, lutCol: Column): Column =
    ColumnBridge.column(PqAdc(
      ColumnBridge.expression(code), ColumnBridge.expression(lutCol)))
}

/** array<float|double> → binary PQ codes (m bytes) against a fixed
  * codebook. Codegen materializes the input once and calls the shared
  * JVM encoder — same shape as [[Int8Quantize]].
  */
case class PqEncode(child: Expression, books: PqVec.Books)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<float|double>, got ${other.catalogString}")
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
    PqVec.encodeFlat(vals, books.flat, books.m, books.k)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val flatRef = ctx.addReferenceObj("pqFlat", books.flat, "double[]")
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
         |${ev.value} = graft.functions.PqVec.encodeFlat(
         |  $vals, $flatRef, ${books.m}, ${books.k});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** (binary codes, array<double> lut) → approximate dot product: m table
  * lookups per row, fully codegen'd — the candidate-scan hot path.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (binary, array<double>), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(code: Any, lutv: Any): Any =
    PqVec.adcSum(code.asInstanceOf[Array[Byte]],
      lutv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      s"""
         |${ev.value} = graft.functions.PqVec.adcSum($c, $l);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
