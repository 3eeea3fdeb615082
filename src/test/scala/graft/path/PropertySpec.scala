package graft.path

import graft.TestSpark
import graft.core.{Graph, NQuads, QValue}
import graft.exec.Exec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based algebra laws over randomly generated graphs — a layer
  * the reference lacks (its tests are purely example-based, SURVEY §5).
  * Laws cover the set semantics the Shape lowering must preserve.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def iri(s: String): QValue = QValue.Iri(s)
  val preds = Seq("p1", "p2", "p3")
  val nodes = ('a' to 'j').map(_.toString)

  val genQuads: Gen[Seq[NQuads.ParsedQuad]] = for {
    n <- Gen.choose(5, 25)
    qs <- Gen.listOfN(n, for {
      s <- Gen.oneOf(nodes)
      p <- Gen.oneOf(preds)
      o <- Gen.oneOf(nodes)
    } yield NQuads.ParsedQuad(iri(s), iri(p), iri(o), None))
  } yield qs.distinct

  /** Deterministic sampling (no scalatestplus bridge in the offline
    * cache): 8 seeded graph samples per law.
    */
  def forAllSampled(f: Seq[NQuads.ParsedQuad] => Unit): Unit =
    (1 to 8).foreach { i =>
      genQuads(Gen.Parameters.default, Seed(i.toLong)) match {
        case Some(qs) if qs.nonEmpty =>
          withClue(s"seed=$i quads=$qs: ")(f(qs))
        case _ =>
      }
    }

  private def graphOf(qs: Seq[NQuads.ParsedQuad]): Graph =
    Graph.fromQuads(spark, qs).cached()

  private def ids(g: Graph, p: Path): Seq[String] =
    Exec.run(g, p).values().map(_.sortKey).sorted

  test("law: and(p, p) == unique-preserving identity on multisets of ids") {
    forAllSampled { qs => {
        val g = graphOf(qs)
        val base = Path.start().out(iri("p1")).unique()
        // A ∩ A = A for deduplicated sets
        assert(ids(g, base.and(base)) === ids(g, base))
      }
    }
  }

  test("law: or is multiset-additive; except removes exactly") {
    forAllSampled { qs => {
        val g = graphOf(qs)
        val a = Path.start().out(iri("p1"))
        val b = Path.start().out(iri("p2"))
        val union = ids(g, a.or(b))
        assert(union === (ids(g, a) ++ ids(g, b)).sorted)
        val exceptB = ids(g, a.unique().except(b))
        val bSet = ids(g, b).toSet
        assert(exceptB === ids(g, a.unique()).filterNot(bSet))
      }
    }
  }

  test("law: out∘in from a reachable target recovers it (adjoint-ish)") {
    forAllSampled { qs => {
        val g = graphOf(qs)
        // every node reached by out(p1) can reach back some origin via in(p1)
        val targets = ids(g, Path.start().out(iri("p1")).unique())
        val back = ids(g,
          Path.start().out(iri("p1")).unique().in(iri("p1")).out(iri("p1")).unique())
        assert(targets.toSet.subsetOf(back.toSet))
      }
    }
  }

  test("law: has(p, v) == is-filtered in(p) origins") {
    forAllSampled { qs => {
        val g = graphOf(qs)
        val v = iri(nodes.head)
        val viaHas = ids(g, Path.start().has(iri("p1"), v).unique())
        val viaIn = ids(g, Path.start(v).in(iri("p1")).unique())
        assert(viaHas === viaIn)
      }
    }
  }

  test("law: count equals collected row count") {
    forAllSampled { qs => {
        val g = graphOf(qs)
        val p = Path.start().has(iri("p2"))
        val cnt = Exec.run(g, p.count()).values() match {
          case Seq(QValue.IntV(n)) => n
          case other               => fail(s"bad count result $other")
        }
        assert(cnt === Exec.run(g, p).values().size)
      }
    }
  }

  test("law: recursive closure is a fixpoint (closure of closure adds nothing)") {
    forAllSampled { qs => {
        val g = graphOf(qs)
        val start = iri(nodes.head)
        val once = ids(g, Path.start(start).followRecursive(iri("p1")))
        // every node in the closure reaches only nodes already in the
        // closure ∪ {start}
        val fromClosure = once.flatMap { n =>
          ids(g, Path.start(QValue.Iri(n.stripPrefix("<").stripSuffix(">")))
            .out(iri("p1")))
        }.toSet
        assert(fromClosure.subsetOf(once.toSet + start.sortKey))
      }
    }
  }
}
