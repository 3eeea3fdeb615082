package graft.path

import graft.TestSpark
import graft.core.{Graph, NQuads, QValue}
import graft.exec.Exec
import org.scalatest.funsuite.AnyFunSuite

/** The reference's dedicated recursive-traversal tests
  * (pathtest.go testFollowRecursive / testFollowRecursiveHas).
  */
class RecursiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def iri(s: String): QValue = QValue.Iri(s)
  def q(s: String, p: String, o: String) =
    NQuads.ParsedQuad(iri(s), iri(p), iri(o), None)

  test("follows recursive order (recursive then Has)") {
    val g = Graph.fromQuads(spark, Seq(
      q("a", "parent", "b"), q("b", "parent", "c"), q("c", "parent", "d"),
      q("c", "labels", "tag"), q("d", "parent", "e"), q("d", "labels", "tag")))
    val p = Path.start(iri("a"))
      .followRecursive(Path.morphism().out(iri("parent")), 0)
      .has(iri("labels"), iri("tag"))
    val got = Exec.run(g, p).values().map(_.sortKey).sorted
    assert(got === Seq("<c>", "<d>"))
  }

  test("depth tags bind the iteration depth as Int values (recursive.go:122)") {
    val g = Graph.fromQuads(spark, Seq(
      q("a", "parent", "b"), q("b", "parent", "c"), q("c", "parent", "d")))
    val p = Path.start(iri("a"))
      .followRecursive(iri("parent"), maxDepth = 0, depthTags = Seq("d"))
    val got = Exec.run(g, p).tagMaps(includeTopLevel = true)
      .map(m => (m("id").sortKey, m("d"))).sortBy(_._1)
    assert(got === Seq(
      ("<b>", QValue.IntV(1)), ("<c>", QValue.IntV(2)), ("<d>", QValue.IntV(3))))
  }

  test("follows recursive loop (cycle, morphism tags, Has)") {
    val g = Graph.fromQuads(spark, Seq(
      q("1", "relatesTo", "x"), q("2", "relatesTo", "x"),
      q("3", "relatesTo", "y"), q("1", "knows", "2"),
      q("2", "knows", "3"), q("2", "knows", "1")))
    val p = Path.start(iri("1"))
      .followRecursive(Path.morphism().tag("pid").out(iri("knows")), 2)
      .has(iri("relatesTo")).tag("id")
    val got = Exec.run(g, p).tagMaps()
      .map(m => (m("id").sortKey, m("pid").sortKey)).sorted
    assert(got === Seq(("<1>", "<2>"), ("<2>", "<1>"), ("<3>", "<2>")))
  }
}
