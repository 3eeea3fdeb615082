package graft.core

import graft.TestSpark
import graft.exec.Exec
import graft.path.Path
import org.scalatest.funsuite.AnyFunSuite

case class Person(pid: Long, name: String, age: Long, score: Double)

// nested object with its own identity (schema_test.go treeItem pattern)
case class NationRef(nid: Long, nname: String)
case class Cust(cid: Long, cname: String, nation: NationRef)

// anonymous nested object (loader.go genObject: BNode children)
case class Addr(street: String, city: String)
case class Resident(pid: Long, name: String, addr: Addr)

// array fields: structs and scalars (slice rules, schema.go:208)
case class Child(cid: Long, cname: String)
case class Parent(pid: Long, name: String, children: Seq[Child])
case class Tagged(pid: Long, tags: Seq[String])

// optional/required (schema_test.go item: `quad:"spec,optional"`)
case class OptItem(pid: Long, name: String, spec: Option[String])
case class ReqItem(pid: Long, name: String, spec: String)

class SchemaMapperSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def iri(s: String): QValue = QValue.Iri(s)

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

  test("fromPath loads only the path's result set (LoadPathTo)") {
    import spark.implicits._
    val people = Seq(
      Person(1L, "Alice", 30L, 9.5),
      Person(2L, "Bob", 25L, 7.25),
      Person(3L, "Cara", 41L, 8.0)).toDS()
    val g = Graph.fromQuadDF(SchemaMapper.toQuads(people, "person", "pid"))
    // roots restricted by a traversal: people with age > 28
    val p = Path.start()
      .hasFilter(QValue.Iri("age"), rev = false,
        graft.shape.ValueFilter.Comparison(
          graft.shape.ValueFilter.GT, QValue.IntV(28L)))
    val loaded = SchemaMapper.fromPath[Person](g, p, "person", "pid")
      .collect().sortBy(_.pid)
    assert(loaded.toSeq === Seq(
      Person(1L, "Alice", 30L, 9.5), Person(3L, "Cara", 41L, 8.0)))
  }

  test("nested object with its own identity round-trips") {
    import spark.implicits._
    val rules = SchemaRules(fields = Map(
      "nation" -> FieldRule(pred = "c_nation", nestedType = "nation",
        nestedId = "nid")))
    val in = Seq(
      Cust(1L, "Alice", NationRef(7L, "FRANCE")),
      Cust(2L, "Bob", NationRef(9L, "JAPAN")))
    val g = Graph.fromQuadDF(
      SchemaMapper.toQuads(in.toDS(), "customer", "cid", rules))

    // the child became a first-class node with typed identity + rdf:type
    val nn = Exec.run(g, Path.start(iri("customer:1"))
      .out(iri("c_nation")).out(iri("nname"))).values()
    assert(nn === Seq(QValue.Str("FRANCE")))
    val typedNations = Exec.run(g, Path.start().has(
      iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
      iri("nation"))).values()
    assert(typedNations.size === 2)

    val back = SchemaMapper.fromQuads[Cust](g, "customer", "cid", rules)
      .collect().sortBy(_.cid)
    assert(back.toSeq === in)
  }

  test("anonymous nested objects (deterministic BNode children)") {
    import spark.implicits._
    val in = Seq(
      Resident(1L, "Alice", Addr("1 Main St", "Springfield")),
      Resident(2L, "Bob", Addr("2 Oak Ave", "Shelbyville")))
    val g = Graph.fromQuadDF(
      SchemaMapper.toQuads(in.toDS(), "resident", "pid"))

    // child is a BNode, reachable through the engine
    val cities = Exec.run(g, Path.start(iri("resident:1"))
      .out(iri("addr")).out(iri("city"))).values()
    assert(cities === Seq(QValue.Str("Springfield")))

    val back = SchemaMapper.fromQuads[Resident](g, "resident", "pid")
      .collect().sortBy(_.pid)
    assert(back.toSeq === in)
  }

  test("array-of-struct fields: one child object per element") {
    import spark.implicits._
    val rules = SchemaRules(fields = Map(
      "children" -> FieldRule(pred = "child", nestedType = "child",
        nestedId = "cid")))
    val in = Seq(
      Parent(1L, "root", Seq(Child(10L, "a"), Child(11L, "b"))),
      Parent(2L, "leafless", Nil))
    val g = Graph.fromQuadDF(
      SchemaMapper.toQuads(in.toDS(), "parent", "pid", rules))

    val kids = Exec.run(g,
      Path.start(iri("parent:1")).out(iri("child"))).values()
    assert(kids.map(_.sortKey).sorted === Seq("<child:10>", "<child:11>"))

    val back = SchemaMapper.fromQuads[Parent](g, "parent", "pid", rules)
      .collect().sortBy(_.pid)
      .map(p => p.copy(children = p.children.sortBy(_.cid)))
    assert(back.toSeq === in)
  }

  test("array-of-scalar fields round-trip (unordered)") {
    import spark.implicits._
    val in = Seq(Tagged(1L, Seq("x", "y", "z")), Tagged(2L, Seq("only")))
    val g = Graph.fromQuadDF(SchemaMapper.toQuads(in.toDS(), "doc", "pid"))
    val back = SchemaMapper.fromQuads[Tagged](g, "doc", "pid")
      .collect().sortBy(_.pid).map(t => t.copy(tags = t.tags.sorted))
    assert(back.toSeq === in)
  }

  test("optional fields load as None; required fields drop the object") {
    import spark.implicits._
    val in = Seq(
      OptItem(1L, "full", Some("deluxe")),
      OptItem(2L, "bare", None))
    val g = Graph.fromQuadDF(SchemaMapper.toQuads(in.toDS(), "item", "pid"))

    // Option field: present -> Some, absent -> None
    val opt = SchemaMapper.fromQuads[OptItem](g, "item", "pid")
      .collect().sortBy(_.pid)
    assert(opt.toSeq === in)

    // required (loader.go: objects missing a required field are skipped)
    val req = SchemaMapper.fromQuads[ReqItem](g, "item", "pid",
      SchemaRules(fields = Map("spec" -> FieldRule(required = Some(true)))))
      .collect().toSeq
    assert(req === Seq(ReqItem(1L, "full", "deluxe")))
  }

  test("reverse direction: child --pred--> parent quads") {
    import spark.implicits._
    val rules = SchemaRules(fields = Map(
      "nation" -> FieldRule(pred = "memberOf", reverse = true,
        nestedType = "nation", nestedId = "nid")))
    val in = Seq(Cust(1L, "Alice", NationRef(7L, "FRANCE")))
    val g = Graph.fromQuadDF(
      SchemaMapper.toQuads(in.toDS(), "customer", "cid", rules))

    // the quad points child -> parent
    val parents = Exec.run(g,
      Path.start(iri("nation:7")).out(iri("memberOf"))).values()
    assert(parents.map(_.sortKey) === Seq("<customer:1>"))

    val back = SchemaMapper.fromQuads[Cust](g, "customer", "cid", rules)
      .collect().toSeq
    assert(back === in)
  }

  test("namespace prefixes expand on save and load") {
    import spark.implicits._
    Namespaces.register("ex:", "http://example.org/")
    val rules = SchemaRules(fields = Map(
      "name" -> FieldRule(pred = "ex:name")))
    val in = Seq(Person(1L, "Alice", 30L, 9.5))
    val g = Graph.fromQuadDF(
      SchemaMapper.toQuads(in.toDS(), "person", "pid", rules))
    val v = Exec.run(g, Path.start(iri("person:1"))
      .out(iri("http://example.org/name"))).values()
    assert(v === Seq(QValue.Str("Alice")))
    val back = SchemaMapper.fromQuads[Person](g, "person", "pid", rules)
      .collect().toSeq
    assert(back === in)
  }

  test("type constraints write extra fixed quads and filter on load") {
    import spark.implicits._
    val constrained = SchemaRules(constraints =
      Seq("kindOf" -> QValue.Iri("some:item")))
    val a = SchemaMapper.toQuads(
      Seq(Person(1L, "Alice", 30L, 9.5)).toDS(), "person", "pid", constrained)
    val b = SchemaMapper.toQuads(
      Seq(Person(2L, "Mallory", 66L, 0.5)).toDS(), "person", "pid")
    val g = Graph.fromQuadDF(a.unionAll(b))

    // both carry rdf:type person, only one carries the constraint quad
    val all = SchemaMapper.fromQuads[Person](g, "person", "pid")
      .collect().sortBy(_.pid)
    assert(all.length === 2)
    val onlyConstrained =
      SchemaMapper.fromQuads[Person](g, "person", "pid", constrained)
        .collect().toSeq
    assert(onlyConstrained === Seq(Person(1L, "Alice", 30L, 9.5)))
  }
}
