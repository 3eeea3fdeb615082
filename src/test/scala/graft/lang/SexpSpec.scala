package graft.lang

import graft.TestSpark
import graft.core.{Graph, NQuads, QValue}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's Sexp corpus
  * (/root/reference/query/sexp/parser_test.go testQueries).
  */
class SexpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(s: String, p: String, o: String) =
    NQuads.ParsedQuad(QValue.Str(s), QValue.Str(p), QValue.Str(o), None)

  private def run(quads: Seq[NQuads.ParsedQuad], query: String) =
    Sexp.session(Graph.fromQuads(spark, quads)).execute(query)

  test("empty") {
    assert(run(Nil, "()") === Nil)
  }

  test("get a single quad linkage") {
    val rows = run(Seq(q("i", "can", "win")), """($a (:can "win"))""")
    assert(rows.map(_("id")) === Seq("i"))
    assert(rows.map(_("$a")) === Seq("i"))
  }

  test("get a single quad linkage (internal)") {
    val rows = run(Seq(q("i", "can", "win")), """("i" (:can $a))""")
    assert(rows.map(_("id")) === Seq("i"))
    assert(rows.map(_("$a")) === Seq("win"))
  }

  test("tree constraint") {
    val rows = run(
      Seq(q("i", "like", "food"), q("food", "is", "good")),
      "(\"i\"\n(:like\n($a (:is :good))))")
    assert(rows.map(_("id")) === Seq("i"))
    assert(rows.map(_("$a")) === Seq("food"))
  }

  test("multiple constraint") {
    val rows = run(
      Seq(q("i", "like", "food"), q("i", "like", "beer"),
        q("you", "like", "beer")),
      """(
        |  $a
        |  (:like :beer)
        |  (:like "food")
        |)""".stripMargin)
    assert(rows.map(_("id")) === Seq("i"))
    assert(rows.map(_("$a")) === Seq("i"))
  }

  test("quoted strings may contain spaces (reference quotedString charset)") {
    val rows = run(Seq(q("i", "status", "cool person")),
      """($a (:status "cool person"))""")
    assert(rows.map(_("id")) === Seq("i"))
  }

  test("reverse constraint") {
    val rows = run(Seq(q("i", "can", "win")), """($a (!:can "i"))""")
    assert(rows.map(_("id")) === Seq("win"))
  }

  test("optional constraint binds without filtering") {
    val rows = run(
      Seq(q("i", "like", "food"), q("you", "like", "food"),
        q("i", "status", "cool")),
      """($a (:like :food) (:status optional $s))""")
    val byId = rows.map(r => r("id") -> r.get("$s")).toMap
    assert(byId.keySet === Set("i", "you"))
    assert(byId("i") === Some("cool"))
    assert(byId("you") === None)
  }
}
