package graft.core

import graft.TestSpark
import graft.exec.Exec
import graft.path.Path
import org.scalatest.funsuite.AnyFunSuite

case class Person(pid: Long, name: String, age: Long, score: Double)

class SchemaMapperSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Dataset[T] -> quads -> Dataset[T] round-trip") {
    import spark.implicits._
    val people = Seq(
      Person(1L, "Alice", 30L, 9.5),
      Person(2L, "Bob", 25L, 7.25)).toDS()
    val g = Graph.fromQuadDF(SchemaMapper.toQuads(people, "person", "pid"))

    // quads are queryable through the engine
    val names = Exec.run(g,
      Path.start(QValue.Iri("person:1")).out(QValue.Iri("name"))).values()
    assert(names === Seq(QValue.Str("Alice")))
    val typed = Exec.run(g, Path.start().has(
      QValue.Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
      QValue.Iri("person"))).values()
    assert(typed.size === 2)

    // and pivot back to the typed Dataset
    val back = SchemaMapper.fromQuads[Person](g, "person", "pid")
      .collect().sortBy(_.pid)
    assert(back.toSeq === Seq(
      Person(1L, "Alice", 30L, 9.5), Person(2L, "Bob", 25L, 7.25)))
  }
}
