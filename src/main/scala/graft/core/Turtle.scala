package graft.core

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Turtle / TriG reader and writer, closing the reference's quad-format
  * family (the reference negotiates any format its quad module registers —
  * server/http/api_v2.go:131-133 — and `cayley convert` routes through the
  * same registry, cmd/cayley/command/convert.go:75-77).
  *
  * Parsing: Turtle statements span lines (prefixes, `;`/`,` lists, nested
  * bnode property lists), so the document is NOT line-splittable — the
  * distributed unit is the FILE (`wholetext` scan → one parse task per
  * file), which is how Turtle corpora scale in practice: many files.
  * Covered grammar: @prefix/@base and SPARQL-style PREFIX/BASE, prefixed
  * names (with `\`-escaped and %-encoded local parts), `a`, `;`/`,`
  * predicate-object lists, anonymous and labeled blank nodes, bnode
  * property lists `[ p o ; ... ]`, collections `( ... )` (expanded to
  * rdf:first/rest/nil), all four string literal quote forms, @lang and
  * ^^datatype literals, numeric shorthands (integer/decimal/double) and
  * booleans. TriG adds graph blocks: `<g> { ... }`, `GRAPH <g> { ... }`,
  * and the default-graph block `{ ... }`.
  *
  * Blank-node labels are DOCUMENT-scoped per RDF semantics: the reader
  * salts every bnode id with a per-file tag so `_:b0` in two files never
  * collides.
  *
  * Writing is fully distributed and line-oriented: triples serialize as
  * N-Triples statements (every N-Triples document is valid Turtle), and
  * TriG named-graph quads serialize as single-statement graph blocks
  * `<g> { s p o . }` (TriG allows a graph to be opened any number of
  * times), so the writer is an embarrassingly-parallel text sink with no
  * driver materialization.
  */
object Turtle {
  import NQuads.ParsedQuad

  private val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val RdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  private val RdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  private val RdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
  private val XsdInteger = "http://www.w3.org/2001/XMLSchema#integer"
  private val XsdDecimal = "http://www.w3.org/2001/XMLSchema#decimal"
  private val XsdDouble = "http://www.w3.org/2001/XMLSchema#double"
  private val XsdString = "http://www.w3.org/2001/XMLSchema#string"

  /** Parse a Turtle document (TriG accepted too — strict Turtle is a
    * subset). `bnodeSalt` keeps labels document-scoped across files.
    * `genSalt` (defaults to `bnodeSalt`) namespaces GENERATED bnode ids
    * (anonymous `[...]` lists, collections) separately — the chunked
    * reader gives every chunk of one file a distinct genSalt while
    * sharing the file's label salt, so labeled bnodes unify across
    * chunks and fresh ones never collide.
    */
  def parse(doc: String, bnodeSalt: String = "",
            genSalt: String = null): Seq[ParsedQuad] =
    new Parser(doc, bnodeSalt,
      if (genSalt == null) bnodeSalt else genSalt).run()

  private final class Parser(s: String, bnodeSalt: String, genSalt: String) {
    private var pos = 0
    private val prefixes = mutable.Map.empty[String, String]
    private var base = ""
    private var genCount = 0
    private val out = mutable.ArrayBuffer.empty[ParsedQuad]
    private var graph: Option[QValue] = None

    private def fail(msg: String): Nothing = {
      val ctx = s.substring(math.max(0, pos - 20),
        math.min(s.length, pos + 20)).replace('\n', ' ')
      throw new IllegalArgumentException(
        s"turtle parse error at offset $pos ('...$ctx...'): $msg")
    }

    private def ws(): Unit = {
      var more = true
      while (more) {
        more = false
        while (pos < s.length && Character.isWhitespace(s.charAt(pos))) pos += 1
        if (pos < s.length && s.charAt(pos) == '#') {
          while (pos < s.length && s.charAt(pos) != '\n') pos += 1
          more = true
        }
      }
    }

    private def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'
    private def eat(c: Char): Unit =
      if (peek == c) pos += 1 else fail(s"expected '$c'")
    private def wordAhead(w: String): Boolean =
      s.regionMatches(true, pos, w, 0, w.length) && {
        val after = pos + w.length
        // also reject ':' so a prefix literally named graph:/true:/... is
        // parsed as a prefixed name, not a keyword (predicateTerm already
        // guards 'a' this way)
        after >= s.length || {
          val c = s.charAt(after)
          !Character.isLetterOrDigit(c) && c != ':'
        }
      }

    private def freshBNode(): QValue = {
      genCount += 1
      QValue.BNode(s"ttlg$genSalt-$genCount")
    }
    private def emit(subj: QValue, pred: QValue, obj: QValue): Unit =
      out += ParsedQuad(subj, pred, obj, graph)

    def run(): Seq[ParsedQuad] = {
      ws()
      while (pos < s.length) {
        statement()
        ws()
      }
      out.toSeq
    }

    private def statement(): Unit = {
      if (peek == '@') directive()
      else if (wordAhead("PREFIX")) { pos += 6; prefixDecl(sparql = true) }
      else if (wordAhead("BASE")) { pos += 4; baseDecl(sparql = true) }
      else if (wordAhead("GRAPH")) {
        pos += 5; ws()
        val g = nodeTerm()
        graphBlock(Some(g))
      } else if (peek == '{') graphBlock(None)
      else {
        // a node term, then either a TriG graph block or a Turtle
        // predicate-object list
        val subj = subjectTerm()
        ws()
        if (peek == '{') graphBlock(Some(subj))
        else {
          predicateObjectList(subj)
          ws(); eat('.')
        }
      }
    }

    private def directive(): Unit = {
      if (s.regionMatches(false, pos, "@prefix", 0, 7)) {
        pos += 7; prefixDecl(sparql = false)
      } else if (s.regionMatches(false, pos, "@base", 0, 5)) {
        pos += 5; baseDecl(sparql = false)
      } else fail("unknown directive")
    }

    private def prefixDecl(sparql: Boolean): Unit = {
      ws()
      val colon = s.indexOf(':', pos)
      if (colon < 0) fail("prefix declaration missing ':'")
      val name = s.substring(pos, colon).trim
      pos = colon + 1
      ws()
      val iri = iriRef()
      prefixes(name) = iri
      if (!sparql) { ws(); eat('.') }
    }

    private def baseDecl(sparql: Boolean): Unit = {
      ws()
      base = iriRef()
      if (!sparql) { ws(); eat('.') }
    }

    private def graphBlock(g: Option[QValue]): Unit = {
      ws(); eat('{')
      val saved = graph
      graph = g
      ws()
      while (peek != '}') {
        val subj = subjectTerm()
        predicateObjectList(subj)
        ws()
        if (peek == '.') { pos += 1; ws() }
        else if (peek != '}') fail("expected '.' or '}' in graph block")
      }
      eat('}')
      graph = saved
    }

    private def predicateObjectList(subj: QValue): Unit = {
      var more = true
      while (more) {
        ws()
        val pred = predicateTerm()
        var moreObj = true
        while (moreObj) {
          ws()
          val obj = objectTerm()
          emit(subj, pred, obj)
          ws()
          if (peek == ',') pos += 1 else moreObj = false
        }
        if (peek == ';') {
          pos += 1; ws()
          // a ';' may be trailing (before '.', '}' or ']')
          if (peek == '.' || peek == '}' || peek == ']') more = false
        } else more = false
      }
    }

    private def predicateTerm(): QValue = {
      if (peek == 'a' && (pos + 1 >= s.length ||
        !isPnChar(s.charAt(pos + 1)) && s.charAt(pos + 1) != ':'))
        { pos += 1; return QValue.Iri(RdfType) }
      peek match {
        case '<' => QValue.Iri(resolve(iriRef()))
        case _   => prefixedName()
      }
    }

    private def subjectTerm(): QValue = {
      ws()
      peek match {
        case '<' => QValue.Iri(resolve(iriRef()))
        case '_' => bnodeLabel()
        case '[' => bnodePropertyList()
        case '(' => collection()
        case _   => prefixedName()
      }
    }

    /** Subject/graph-position term (no literals). */
    private def nodeTerm(): QValue = subjectTerm()

    private def objectTerm(): QValue = peek match {
      case '<' => QValue.Iri(resolve(iriRef()))
      case '_' => bnodeLabel()
      case '[' => bnodePropertyList()
      case '(' => collection()
      case '"' | '\'' => literal()
      case c if c == '+' || c == '-' || Character.isDigit(c) => numeric()
      case _ =>
        if (wordAhead("true")) { pos += 4; QValue.BoolV(true) }
        else if (wordAhead("false")) { pos += 5; QValue.BoolV(false) }
        else prefixedName()
    }

    private def iriRef(): String = {
      ws(); eat('<')
      val end = s.indexOf('>', pos)
      if (end < 0) fail("unterminated IRI")
      val raw = s.substring(pos, end)
      pos = end + 1
      NQuadEscape.unescape(raw)
    }

    // absolute iff it starts with a scheme (RFC 3986) — a '://' appearing
    // later in a relative reference must not suppress resolution
    private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:".r
    private def resolve(iri: String): String =
      if (base.isEmpty || SchemeRe.findPrefixOf(iri).isDefined) iri
      else scala.util.Try(
        new java.net.URI(base).resolve(iri).toString).getOrElse(base + iri)

    private def bnodeLabel(): QValue = {
      eat('_'); eat(':')
      val start = pos
      while (pos < s.length && (isPnChar(s.charAt(pos)) ||
        (s.charAt(pos) == '.' && pos + 1 < s.length && isPnChar(s.charAt(pos + 1)))))
        pos += 1
      if (pos == start) fail("empty blank node label")
      QValue.BNode(s.substring(start, pos) +
        (if (bnodeSalt.isEmpty) "" else "-" + bnodeSalt))
    }

    private def bnodePropertyList(): QValue = {
      eat('[')
      val node = freshBNode()
      ws()
      if (peek != ']') predicateObjectList(node)
      ws(); eat(']')
      node
    }

    private def collection(): QValue = {
      eat('(')
      ws()
      val items = mutable.ArrayBuffer.empty[QValue]
      while (peek != ')') {
        items += objectTerm()
        ws()
      }
      eat(')')
      if (items.isEmpty) QValue.Iri(RdfNil)
      else {
        val nodes = items.map(_ => freshBNode())
        for (i <- items.indices) {
          emit(nodes(i), QValue.Iri(RdfFirst), items(i))
          emit(nodes(i), QValue.Iri(RdfRest),
            if (i + 1 < items.size) nodes(i + 1) else QValue.Iri(RdfNil))
        }
        nodes.head
      }
    }

    private def isPnChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '-' ||
        (c >= 0x00C0 && Character.isLetter(c))

    private def prefixedName(): QValue = {
      val start = pos
      while (pos < s.length && isPnChar(s.charAt(pos))) pos += 1
      if (peek != ':') fail(s"expected prefixed name")
      val pfx = s.substring(start, pos)
      pos += 1
      val baseIri = prefixes.getOrElse(pfx, fail(s"undeclared prefix '$pfx:'"))
      // PN_LOCAL: letters/digits/_-., %XX encodings and \-escapes; a '.'
      // is only part of the name when followed by another name char
      val local = new StringBuilder
      var done = false
      while (!done && pos < s.length) {
        val c = s.charAt(pos)
        if (isPnChar(c) || c == ':') { local.append(c); pos += 1 }
        else if (c == '%' && pos + 2 < s.length) {
          local.append(s.substring(pos, pos + 3)); pos += 3
        } else if (c == '\\' && pos + 1 < s.length) {
          local.append(s.charAt(pos + 1)); pos += 2
        } else if (c == '.' && pos + 1 < s.length &&
          (isPnChar(s.charAt(pos + 1)) || s.charAt(pos + 1) == ':' ||
            s.charAt(pos + 1) == '\\' || s.charAt(pos + 1) == '%')) {
          local.append(c); pos += 1
        } else done = true
      }
      QValue.Iri(baseIri + local.toString)
    }

    private def numeric(): QValue = {
      val start = pos
      if (peek == '+' || peek == '-') pos += 1
      var isDouble = false; var isDecimal = false
      while (pos < s.length && Character.isDigit(s.charAt(pos))) pos += 1
      if (peek == '.' && pos + 1 < s.length &&
        Character.isDigit(s.charAt(pos + 1))) {
        isDecimal = true; pos += 1
        while (pos < s.length && Character.isDigit(s.charAt(pos))) pos += 1
      }
      if (peek == 'e' || peek == 'E') {
        isDouble = true; pos += 1
        if (peek == '+' || peek == '-') pos += 1
        while (pos < s.length && Character.isDigit(s.charAt(pos))) pos += 1
      }
      val lex = s.substring(start, pos)
      if (lex.isEmpty || lex == "+" || lex == "-") fail("bad numeric literal")
      NQuads.typedValue(lex,
        if (isDouble) XsdDouble else if (isDecimal) XsdDecimal else XsdInteger)
    }

    private def literal(): QValue = {
      val q = peek
      val long = s.regionMatches(false, pos, s"$q$q$q", 0, 3)
      val lex =
        if (long) {
          pos += 3
          // escape-aware scan: a backslash consumes the next char, so an
          // escaped quote right before the delimiter can't end it early
          val start = pos
          var endIdx = -1
          var i = pos
          while (endIdx < 0 && i < s.length) {
            val c = s.charAt(i)
            if (c == '\\') i += 2
            else if (c == q && s.regionMatches(false, i, s"$q$q$q", 0, 3) &&
              // a run of >3 quotes: the LAST three close the literal
              !(i + 3 < s.length && s.charAt(i + 3) == q)) endIdx = i
            else i += 1
          }
          if (endIdx < 0) fail("unterminated long string")
          val raw = s.substring(start, endIdx)
          pos = endIdx + 3
          NQuadEscape.unescape(raw)
        } else {
          pos += 1
          val sb = new StringBuilder
          var done = false
          val start = pos
          while (!done) {
            if (pos >= s.length) fail("unterminated string")
            val c = s.charAt(pos)
            if (c == '\\') pos += 2
            else if (c == q) done = true
            else pos += 1
          }
          sb.append(NQuadEscape.unescape(s.substring(start, pos)))
          pos += 1
          sb.toString
        }
      if (peek == '@') {
        pos += 1
        val start = pos
        while (pos < s.length && (Character.isLetterOrDigit(s.charAt(pos)) ||
          s.charAt(pos) == '-')) pos += 1
        QValue.LangStr(lex, s.substring(start, pos))
      } else if (peek == '^' && pos + 1 < s.length && s.charAt(pos + 1) == '^') {
        pos += 2
        val dt = peek match {
          case '<' => resolve(iriRef())
          case _ => prefixedName() match {
            case QValue.Iri(i) => i
            case other         => fail(s"datatype must be an IRI, got $other")
          }
        }
        if (dt == XsdString) QValue.Str(lex) else NQuads.typedValue(lex, dt)
      } else QValue.Str(lex)
    }
  }

  // ---------------------------------------------------------------- read

  /** Distributed Turtle/TriG read. Small files parse one task per file
    * (`wholetext` — a Turtle document is not line-splittable), bnode
    * labels salted per file so document scoping survives multi-file
    * inputs; .gz handled by the text source's codec support. A LARGE
    * uncompressed file (≥ 2 × `chunkBytes`) is no longer a one-task
    * bottleneck: it routes through [[TurtleChunked]], which finds
    * statement boundaries in parallel via composed lexical-state
    * summaries and parses the chunks concurrently (falling back to
    * wholetext if the file proves unsafe to split).
    */
  def read(spark: SparkSession, path: String,
           chunkBytes: Long = 32L << 20): Graph = {
    import spark.implicits._
    def salt(f: String): String = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(f).toLong & 0xFFFFFFFFL)
    def wholetext(p: Seq[String]): org.apache.spark.sql.DataFrame =
      spark.read.option("wholetext", "true")
        .text(p: _*).select(
          org.apache.spark.sql.functions.input_file_name().as("f"),
          org.apache.spark.sql.functions.col("value"))
        .as[(String, String)]
        .flatMap { case (f, doc) =>
          parse(doc, salt(f)).map(Graph.QuadRow(_))
        }.toDF()
    // list the input so oversized uncompressed files can take the
    // chunked path; if listing fails, keep the original behavior
    val listed: Option[Seq[(String, Long)]] = scala.util.Try {
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st =
        if (fs.getFileStatus(hp).isDirectory) fs.listStatus(hp).toSeq
        else Seq(fs.getFileStatus(hp))
      st.filter(_.isFile)
        .filterNot(s => s.getPath.getName.startsWith(".") ||
          s.getPath.getName.startsWith("_"))
        .map(s => (s.getPath.toString, s.getLen))
    }.toOption
    val rows = listed match {
      case None => wholetext(Seq(path))
      case Some(files) =>
        def compressed(f: String) =
          f.endsWith(".gz") || f.endsWith(".bz2")
        val (big, small) = files.partition { case (f, len) =>
          len >= 2 * chunkBytes && !compressed(f)
        }
        val parts =
          (if (small.nonEmpty) Seq(wholetext(small.map(_._1))) else Nil) ++
          big.map { case (f, len) =>
            TurtleChunked.readFileChunked(spark, f, len, chunkBytes, salt(f))
          }
        if (parts.isEmpty) wholetext(Seq(path)) // surface the same error
        else parts.reduce(_ unionByName _)
    }
    Graph.fromQuadDF(rows)
  }

  // --------------------------------------------------------------- write

  /** Distributed Turtle write (triples only — graph labels dropped, like
    * the N-Triples writer): one N-Triples-form statement per line, which
    * is valid Turtle by inclusion.
    */
  def writeTurtle(g: Graph, path: String): Unit =
    Formats.ntripleLines(g).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)

  /** Distributed TriG write: default-graph quads as bare statements,
    * named-graph quads as one-statement `<g> { s p o . }` blocks (TriG
    * permits reopening a graph), so the sink stays line-oriented and
    * needs no per-graph grouping shuffle.
    */
  def writeTrig(g: Graph, path: String): Unit =
    Formats.trigLines(g).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).text(path)
}
