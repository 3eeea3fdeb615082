package graft.core

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TurtleChunkedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Hostile-but-valid document: fake terminators inside comments, long
    * strings (with escaped quotes) and graph blocks; decimals; labeled
    * bnodes recurring far apart; anonymous property lists and
    * collections; a mid-file prefix declaration used only after it.
    */
  private def hostileDoc(n: Int): String = {
    val sb = new StringBuilder
    sb ++= "@prefix ex: <http://e/> .\n"
    sb ++= "# comment with a dot . and \"quotes\" and 'more'\n"
    for (i <- 0 until n) {
      sb ++= s"ex:s$i ex:name \"\"\"multi\nline . fake \\\" end\"\"\" ;\n"
      sb ++= s"  ex:dec $i.25 ;\n"
      sb ++= s"  ex:ref _:shared${i % 7} .\n"
      if (i % 5 == 0)
        sb ++= s"<http://g/$i> { ex:g$i ex:in \"block . dot\" . }\n"
      if (i % 11 == 0)
        sb ++= s"ex:t$i ex:list ( 1 2.5 'x . y' ) ; ex:anon [ ex:k ex:v ] .\n"
      if (i == n / 2) sb ++= "@prefix late: <http://late/> .\n"
      if (i > n / 2 && i % 13 == 0) sb ++= s"late:x$i late:p late:y .\n"
      // PN_LOCAL backslash escapes: the escaped dot is followed by
      // whitespace and the real terminator — a boundary scanner that
      // treats '\' as inert would split this statement at the fake dot
      if (i % 17 == 0)
        sb ++= s"ex:esc\\.$i ex:p ex:o$i\\. .\n"
    }
    sb.toString
  }

  test("TtlScan chunk summaries compose to the direct scan state") {
    import TurtleChunked.TtlScan
    val bytes = hostileDoc(40).getBytes("UTF-8")
    val (dirEnd, dirDepth) = TtlScan.summarize(bytes)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 30) {
      val cut = 1 + rnd.nextInt(bytes.length - 2)
      val (e1, d1) = TtlScan.summarize(bytes.slice(0, cut))
      val (e2, d2) = TtlScan.summarize(bytes.slice(cut, bytes.length))
      val mid = e1(TtlScan.N)
      assert(e2(mid) === dirEnd(TtlScan.N), s"state at cut $cut")
      assert(d1(TtlScan.N) + d2(mid) === dirDepth(TtlScan.N),
        s"depth at cut $cut")
    }
  }

  test("chunked read of one large file equals the wholetext parse") {
    val doc = hostileDoc(1500)
    val dir = Files.createTempDirectory("graft-ttlchunk")
    val file = dir.resolve("big.ttl")
    Files.writeString(file, doc)
    assert(Files.size(file) > 8 * 4096, "fixture must exceed 2 chunks")

    // reference: the single-document parser
    val ref = Turtle.parse(doc, "S")
    // chunked: 4 KB chunks force dozens of ranges and every lookahead
    // and preamble path
    val g = Turtle.read(spark, file.toString, chunkBytes = 4096)
    val lines = Formats.nquadLines(g).collect().map(_.getString(0))
    assert(lines.length === ref.size)

    // structural equality modulo generated-bnode names: wildcard bnode
    // tokens and compare multisets; then require the DISTINCT bnode
    // count to match (labels unify across chunks, fresh ids never
    // collide — a failure either way changes the count)
    val bnodeRe = "_:[^ ]+".r
    def normalize(ls: Seq[String]): Map[String, Int] =
      ls.map(l => bnodeRe.replaceAllIn(l, "_:x"))
        .groupBy(identity).view.mapValues(_.size).toMap
    val refLines = ref.map(NQuads.serialize)
    assert(normalize(lines.toSeq) === normalize(refLines))
    def bnodeCount(ls: Seq[String]): Int =
      ls.flatMap(l => bnodeRe.findAllIn(l)).distinct.size
    assert(bnodeCount(lines.toSeq) === bnodeCount(refLines))
  }

  test("chunked path is actually taken and small files still wholetext") {
    val dir = Files.createTempDirectory("graft-ttlmix")
    Files.writeString(dir.resolve("small.ttl"),
      "@prefix ex: <http://e/> .\nex:a ex:p ex:b .\n")
    val big = new StringBuilder("@prefix ex: <http://e/> .\n")
    for (i <- 0 until 400) big ++= s"ex:b$i ex:p ex:c$i .\n"
    Files.writeString(dir.resolve("big.ttl"), big.toString)
    // chunk 1 KB: big.ttl (~9 KB) chunks, small.ttl stays wholetext;
    // quads from both land in one graph
    val g = Turtle.read(spark, dir.toString, chunkBytes = 1024)
    assert(g.stats._2 === 401)
  }

  test("a file the scanner cannot split falls back to wholetext") {
    val dir = Files.createTempDirectory("graft-ttlfb")
    // an unbalanced ']' drives the boundary scan's depth negative mid
    // file — inside a graph-block region large enough to matter the
    // fallback must re-parse wholetext; here the document is INVALID,
    // so the observable contract is: same error class as the
    // single-task path, not a chunking artifact
    val bad = new StringBuilder("@prefix ex: <http://e/> .\n")
    for (i <- 0 until 300) bad ++= s"ex:b$i ex:p ex:c$i .\n"
    bad ++= "ex:z ex:p ] .\n"
    for (i <- 0 until 300) bad ++= s"ex:d$i ex:p ex:e$i .\n"
    Files.writeString(dir.resolve("bad.ttl"), bad.toString)
    val e = intercept[Exception] {
      Turtle.read(spark, dir.toString, chunkBytes = 1024).stats
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      String.valueOf(t.getMessage).contains("turtle parse error")), e)
  }
}
