package graft.functions

import graft.TestSpark
import graft.core.{Graph, NQuads, QValue}
import graft.exec.Exec
import graft.path.Path
import org.scalatest.funsuite.AnyFunSuite

/** RE2 dialect parity: patterns the reference rejects (regex.go compiles
  * with RE2) must be rejected here too, not silently evaluated with Java
  * semantics.
  */
class Re2CompatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("validator rejects Java-only constructs") {
    intercept[Re2Compat.Re2SyntaxError](Re2Compat.validate("(a)\\1"))
    intercept[Re2Compat.Re2SyntaxError](Re2Compat.validate("a(?=b)"))
    intercept[Re2Compat.Re2SyntaxError](Re2Compat.validate("a(?!b)"))
    intercept[Re2Compat.Re2SyntaxError](Re2Compat.validate("(?<=a)b"))
    intercept[Re2Compat.Re2SyntaxError](Re2Compat.validate("a*+b"))
    intercept[Re2Compat.Re2SyntaxError](Re2Compat.validate("\\k<name>"))
    // RE2-legal syntax passes
    Re2Compat.validate("ar?li.*e")
    Re2Compat.validate("(?i)case")
    Re2Compat.validate("(?:group)+")
    // Go's octal rule: lone nonzero digit = backreference error, even in
    // a class; digit runs are octal (regexp/syntax/parse.go parseEscape)
    intercept[Re2Compat.Re2SyntaxError](Re2Compat.validate("[a\\1]"))
    Re2Compat.validate("a\\0")  // octal escape
    Re2Compat.validate("a\\12") // octal \n, not a backreference
  }

  test("a backreference pattern fails at plan time through the Path API") {
    val g = Graph.fromQuads(spark, Seq(
      NQuads.ParsedQuad(QValue.Iri("n"), QValue.Iri("p"), QValue.Str("aa"), None)))
    intercept[Re2Compat.Re2SyntaxError] {
      Exec.run(g, Path.start().out(QValue.Iri("p")).regex("(a)\\1")).values()
    }
  }
}
