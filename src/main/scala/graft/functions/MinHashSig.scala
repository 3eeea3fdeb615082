package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-ROW MinHash signature over an array of shingle strings —
  * bit-identical to the batch family `min(xxhash64(xxhash64(shingle), i))`
  * that [[graft.analytics.Dedup.minhashSignatures]] computes with a
  * hash-aggregate ([[graft.core.XXH64]] carries the Spark-parity xxhash64;
  * XXH64ParitySpec pins it).
  *
  * Why per-row: streaming near-dup detection needs the signature BEFORE
  * its one allowed stateful operation (flatMapGroupsWithState over LSH
  * buckets) — a groupBy signature aggregate would be a second stateful op,
  * which Structured Streaming forbids in one query. This computes the
  * k mins in a single shingles×k codegen loop per document row, so batch
  * and stream produce identical signatures and their candidates agree.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 && k <= 512 =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string> and 0<k<=512, got ${other.catalogString}, k=$k")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    new GenericArrayData(
      MinHashSig.signature(
        (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) null
          else arr.getUTF8String(i).getBytes
        }.toArray, k))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val arrData = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val bufs = ctx.freshName("bufs")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |byte[][] $bufs = new byte[$n][];
         |for (int $i = 0; $i < $n; $i++) {
         |  $bufs[$i] = $c.isNullAt($i) ? null : $c.getUTF8String($i).getBytes();
         |}
         |${ev.value} = new $arrData(
         |  graft.functions.MinHashSig.signature($bufs, $k));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))

  /** JVM kernel shared by interpreted eval and generated code. Mirrors the
    * batch chain exactly: `h = xxhash64(utf8(shingle), seed 42)` (Spark's
    * `xxhash64(col)`), then salted `xxhash64(h, i)` = `hashInt(i,
    * hashLong(h, 42))` (Spark hashes the long column, then the int
    * literal, chaining seeds).
    */
  def signature(shingles: Array[Array[Byte]], k: Int): Array[Long] = {
    import graft.core.XXH64
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < shingles.length) {
      val b = shingles(j)
      if (b != null) {
        val h = XXH64.hashBytes(b, 42L)
        val base = XXH64.hashLong(h, 42L)
        var i = 0
        while (i < k) {
          val m = XXH64.hashInt(i, base)
          if (m < out(i)) out(i) = m
          i += 1
        }
      }
      j += 1
    }
    out
  }

  /** Signature-estimated Jaccard: fraction of agreeing positions. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val n = math.min(a.length, b.length)
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a(i) == b(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }
}
