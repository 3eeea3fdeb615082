package graft.core

import graft.TestSpark
import graft.core.Mutation._
import org.scalatest.funsuite.AnyFunSuite

/** Ported from the reference writer-semantics corpus
  * (graphtest.go TestWriters dup/missing matrix, TestDeleteReinserted,
  * transaction.go behavior).
  */
class MutationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(s: String, p: String, o: String) =
    NQuads.ParsedQuad(QValue.Str(s), QValue.Str(p), QValue.Str(o), None)

  private def empty = Graph.fromQuads(spark, Nil)

  test("writer matrix: dup/missing errors and ignore flags (TestWriters)") {
    for (mis <- Seq(false, true); dup <- Seq(false, true)) {
      val w = new Writer(empty, IgnoreOpts(ignoreDup = dup, ignoreMissing = mis))
      val quad = q("a", "b", "c")

      w.addQuad(quad)
      assert(w.graph.stats._2 === 1)

      // duplicate add
      if (dup) { w.addQuad(quad); assert(w.graph.stats._2 === 1) }
      else {
        val e = intercept[DeltaError](w.addQuad(quad))
        assert(e.err === ErrQuadExists)
      }

      // remove non-existent quads
      for (bad <- Seq(q("a", "b", "not-existent"), q("a", "c", "b"), q("c", "b", "a"))) {
        if (mis) w.removeQuad(bad)
        else {
          val e = intercept[DeltaError](w.removeQuad(bad))
          assert(e.err === ErrQuadNotExist)
        }
      }
      assert(w.graph.stats._2 === 1) // store state intact

      // remove existing, re-add
      w.removeQuad(quad)
      assert(w.graph.stats._2 === 0)
      w.addQuad(quad)
      assert(w.graph.stats._2 === 1)
    }
  }

  test("transaction cancels add against pending remove (transaction.go)") {
    val tx = new Transaction
    tx.addQuad(q("e", "f", "g"))
    tx.removeQuad(q("a", "b", "c"))
    tx.addQuad(q("a", "b", "c")) // cancels the remove
    tx.addQuad(q("e", "f", "g")) // dedup
    assert(tx.deltas === Seq(Delta(q("e", "f", "g"), Add)))

    val tx2 = new Transaction
    tx2.addQuad(q("x", "y", "z"))
    tx2.removeQuad(q("x", "y", "z")) // cancels the add
    assert(tx2.deltas === Nil)
  }

  test("batch deltas validate against snapshot plus earlier deltas") {
    val g = applyDeltas(empty, Seq(Delta(q("a", "b", "c"), Add)))
    // delete-then-readd in one batch is legal
    val g2 = applyDeltas(g, Seq(
      Delta(q("a", "b", "c"), Delete), Delta(q("a", "b", "c"), Add)))
    assert(g2.stats._2 === 1)
    // add-then-add in one batch is a dup
    val e = intercept[DeltaError](applyDeltas(g, Seq(
      Delta(q("n", "e", "w"), Add), Delta(q("n", "e", "w"), Add))))
    assert(e.err === ErrQuadExists)
  }

  test("delete-reinserted round trip keeps queries consistent (TestDeleteReinserted)") {
    import graft.exec.Exec
    import graft.path.Path
    val w = new Writer(empty)
    w.addQuad(q("alice", "follows", "bob"))
    w.removeQuad(q("alice", "follows", "bob"))
    w.addQuad(q("alice", "follows", "bob"))
    val got = Exec.run(w.graph, Path.start(QValue.Str("alice"))
      .out(QValue.Str("follows"))).values()
    assert(got === Seq(QValue.Str("bob")))
  }
}
