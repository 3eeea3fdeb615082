package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** All L-gram window hashes of a string in ONE pass: element `i`
  * (0-based) is a 64-bit hash of the L code points starting at code
  * point `i`, i.e. of `substr(text, i+1, L)` in SQL semantics. Rolling
  * polynomial accumulation makes the pass O(n) instead of the O(n·L)
  * of hashing an explicit substring at every position — at L = 40
  * that is a 40× cut in the span-dedup candidate scan
  * ([[graft.analytics.Dedup.duplicateSpans]]).
  *
  * Equal grams always hash equal (the guarantee exact verification
  * relies on); unequal grams may collide — polynomial structure is
  * smashed with a murmur-style finalizer so collisions stay near the
  * 2^-64 floor, and the caller's exact verify stage makes any survivor
  * cost work, never correctness. Rolls over CODE POINTS to agree with
  * SQL `substr`/`length` semantics on non-BMP input.
  */
case class RollingHash(child: Expression, L: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if L > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string and L > 0, got ${other.catalogString}, L=$L")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(RollingHash.windowHashes(input.toString, L))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val arrData = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new $arrData(
         |  graft.functions.RollingHash.windowHashes($c.toString(), $L));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  def apply(text: Column, L: Int): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(text), L))

  private final val B = 0x100000001b3L // FNV-ish odd multiplier

  /** splitmix64 finalizer: destroys the polynomial lattice so banding/
    * bucketing downstream sees uniform bits.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** JVM kernel shared by interpreted eval and generated code. */
  def windowHashes(s: String, L: Int): Array[Long] = {
    // code-point array (SQL substr/length count code points, not chars)
    val n0 = s.codePointCount(0, s.length)
    if (n0 < L) return Array.emptyLongArray
    val cps = new Array[Int](n0)
    var ci = 0
    var i = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(i) = cp
      i += 1
      ci += Character.charCount(cp)
    }
    // h(w) = sum cps(w+j) * B^(L-1-j), rolled left-to-right
    var bPow = 1L // B^(L-1)
    var j = 1
    while (j < L) { bPow *= B; j += 1 }
    val out = new Array[Long](n0 - L + 1)
    var h = 0L
    i = 0
    while (i < L) { h = h * B + cps(i); i += 1 }
    out(0) = mix(h)
    var w = 1
    while (w <= n0 - L) {
      h = (h - cps(w - 1) * bPow) * B + cps(w + L - 1)
      out(w) = mix(h)
      w += 1
    }
    out
  }
}
