package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unanchored RE2 match predicate — the engine's replacement for `rlike`
  * in the regex value-filter (reference graph/iterator/regex.go uses Go's
  * regexp, which IS RE2; the DuckDB oracle's `regexp_matches` is RE2
  * too, so this closes the last dialect gap: POSIX classes, octal
  * escapes, `\Z` rejection, ASCII Perl classes).
  *
  * The pattern is a plan-time constant: it is parsed and compiled to a
  * Pike-VM [[Re2.Prog]] once per plan (a [[Re2Compat.Re2SyntaxError]]
  * surfaces at `Lower` time, matching the reference's plan-time regex
  * compile error), and the compiled program rides into generated code as
  * a reference object — the match call stays inside whole-stage codegen,
  * and evaluation is guaranteed linear in the input, immune to the
  * catastrophic backtracking `rlike` inherits from java.util.regex.
  */
case class Re2Match(child: Expression, pattern: String)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"re2_match requires a string input, got ${other.catalogString}")
    }

  @transient private lazy val prog: Re2.Prog = Re2.compile(pattern)

  override protected def nullSafeEval(input: Any): Any =
    prog.matches(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val progRef = ctx.addReferenceObj("re2Prog", prog)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $progRef.matches($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Re2Match =
    copy(child = newChild)
}

object Re2Match {

  /** `re2_match(col, pattern)`; compiles (and so validates) the pattern
    * at plan time.
    */
  def apply(c: Column, pattern: String): Column = {
    Re2.compile(pattern) // fail fast at plan time, not first task
    ColumnBridge.column(Re2Match(ColumnBridge.expression(c), pattern))
  }
}
