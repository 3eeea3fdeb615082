package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Quad interchange formats beyond the canonical Parquet store: N-Quads
  * writer sink (the reference's `cayley dump`,
  * /root/reference/cmd/cayley/command/database.go:143) and a pragmatic
  * JSON-LD reader for the @context/@graph document shape
  * (/root/reference/data/people.jsonld). Together with the N-Quads reader
  * this gives `cayley convert`-style transcoding (convert.go:75-77).
  */
object Formats {
  /** One N-Quads line per quad, as a single-column DataFrame — the
    * distributed serializer behind [[writeNQuads]] and the HTTP read
    * endpoint. Round-trips through [[NQuads.parseLine]].
    */
  def nquadLines(g: Graph): DataFrame = {
    val n = g.nodes
    def term(alias: String): org.apache.spark.sql.Column = {
      val f = (c: String) => col(s"$alias.$c")
      val k = f("kind")
      // N-Quads string-literal escaping: backslash first, then quote and
      // the control characters \n \r \t (mirrors NQuads.parseLine's unescape)
      val esc = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(f("s"), "\\\\", "\\\\\\\\"),
        "\"", "\\\\\""), "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
      when(k === Kind.Iri, concat(lit("<"), f("s"), lit(">")))
        .when(k === Kind.BNode, concat(lit("_:"), f("s")))
        .when(k === Kind.Str, concat(lit("\""), esc, lit("\"")))
        .when(k === Kind.LangStr, concat(lit("\""), esc, lit("\"@"), f("lang")))
        .when(k === Kind.TypedStr,
          concat(lit("\""), esc, lit("\"^^<"), f("dt"), lit(">")))
        .when(k === Kind.IntK, concat(lit("\""), f("i"),
          lit("\"^^<http://www.w3.org/2001/XMLSchema#integer>")))
        .when(k === Kind.FloatK, concat(lit("\""), f("d"),
          lit("\"^^<http://www.w3.org/2001/XMLSchema#double>")))
        .when(k === Kind.BoolK, concat(lit("\""), f("b"),
          lit("\"^^<http://www.w3.org/2001/XMLSchema#boolean>")))
        .when(k === Kind.TimeK, concat(lit("\""),
          date_format((f("t").cast("double") / 1000000.0d).cast("timestamp"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          lit("\"^^<http://www.w3.org/2001/XMLSchema#dateTime>")))
    }
    def dict(keyCol: String, alias: String) =
      n.select(col("id").as(keyCol), struct(Values.fieldNames.map(col): _*)
        .as(alias))
    val q = g.quads
      .join(dict("__s", "sv"), col("s") === col("__s"))
      .join(dict("__p", "pv"), col("p") === col("__p"))
      .join(dict("__o", "ov"), col("o") === col("__o"))
      .join(dict("__l", "lv"), col("l") === col("__l"), "left")
    q.select(concat_ws(" ", term("sv"), term("pv"), term("ov"),
      when(col("l").isNotNull, term("lv")), lit(".")).as("value"))
  }

  /** Serialize a graph to N-Quads text files (distributed write). */
  def writeNQuads(g: Graph, path: String): Unit =
    nquadLines(g).write.mode(SaveMode.Overwrite).text(path)

  /** Pragmatic JSON-LD reader: @context prefix/vocab expansion, @graph
    * arrays, @id/@type, nested node objects, literal values. Covers the
    * document shapes the reference ships (people.jsonld); not a full
    * JSON-LD 1.1 processor.
    */
  def readJsonLd(spark: SparkSession, path: String): Graph = {
    val text = String.join("\n",
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)))
    readJsonLdRoot(spark,
      org.json4s.jackson.JsonMethods.parse(text).values
        .asInstanceOf[Map[String, Any]])
  }

  /** The RDF list vocabulary (JSON-LD `@list` encodes as
    * rdf:first/rdf:rest chains terminated by rdf:nil).
    */
  val RdfFirst = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
  val RdfRest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
  val RdfNil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

  def readJsonLdRoot(spark: SparkSession, root: Map[String, Any]): Graph = {
    val ctx = root.getOrElse("@context", Map.empty).asInstanceOf[Map[String, Any]]
    val vocab = ctx.get("@vocab").map(_.toString).getOrElse("")
    val base = ctx.get("@base").map(_.toString).getOrElse(vocab)
    val prefixes = ctx.collect {
      case (k, v: String) if !k.startsWith("@") => k -> v
    }

    def expandWith(term: String, default: String): String = {
      val i = term.indexOf(':')
      if (i > 0 && prefixes.contains(term.substring(0, i)))
        prefixes(term.substring(0, i)) + term.substring(i + 1)
      else if (term.startsWith("http:") || term.startsWith("https:")) term
      else default + term
    }
    // identifiers expand against @base, vocabulary terms against @vocab
    def expand(term: String): String = expandWith(term, base)
    def expandProp(term: String): String = expandWith(term, vocab)

    val quads = Vector.newBuilder[NQuads.ParsedQuad]
    var blankCounter = 0

    def nodeId(obj: Map[String, Any]): QValue = obj.get("@id") match {
      case Some(id: String) => QValue.Iri(expand(id))
      case _ =>
        blankCounter += 1
        QValue.BNode(s"b$blankCounter")
    }

    def literal(v: Any): QValue = v match {
      case s: String  => QValue.Str(s)
      case b: Boolean => QValue.BoolV(b)
      case i: BigInt  => QValue.IntV(i.toLong)
      case d: Double  => QValue.FloatV(d)
      case other      => QValue.Str(String.valueOf(other))
    }

    /** `@list` → rdf:first/rdf:rest chain, returns the head (or rdf:nil). */
    def rdfList(items: List[Any]): QValue = items match {
      case Nil => QValue.Iri(RdfNil)
      case head :: tail =>
        blankCounter += 1
        val cell = QValue.BNode(s"b$blankCounter")
        val headV = head match {
          case m: Map[_, _] =>
            val mm = m.asInstanceOf[Map[String, Any]]
            if (mm.keySet == Set("@id")) QValue.Iri(expand(mm("@id").toString))
            else walk(mm)
          case x => literal(x)
        }
        quads += NQuads.ParsedQuad(cell, QValue.Iri(RdfFirst), headV, None)
        quads += NQuads.ParsedQuad(cell, QValue.Iri(RdfRest), rdfList(tail), None)
        cell
    }

    def walk(obj: Map[String, Any]): QValue = {
      val subj = nodeId(obj)
      obj.foreach {
        case ("@id", _) | ("@context", _) =>
        case ("@type", t) =>
          val types = t match { case l: List[_] => l; case x => List(x) }
          types.foreach(tv => quads += NQuads.ParsedQuad(subj,
            QValue.Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
            QValue.Iri(expandProp(tv.toString)), None))
        case ("@graph", l: List[_]) =>
          l.foreach(x => walk(x.asInstanceOf[Map[String, Any]]))
        case (pred, value) =>
          val p = QValue.Iri(expandProp(pred))
          def objectOf(v: Any): QValue = v match {
            case m: Map[_, _] =>
              val mm = m.asInstanceOf[Map[String, Any]]
              if (mm.keySet == Set("@id")) QValue.Iri(expand(mm("@id").toString))
              else if (mm.contains("@value")) literal(mm("@value"))
              else if (mm.contains("@list")) rdfList(
                mm("@list").asInstanceOf[List[Any]])
              else walk(mm)
            case x => literal(x)
          }
          def emit(v: Any): Unit = v match {
            case l: List[_] => l.foreach(e =>
              quads += NQuads.ParsedQuad(subj, p, objectOf(e), None))
            case x => quads += NQuads.ParsedQuad(subj, p, objectOf(x), None)
          }
          emit(value)
      }
      subj
    }

    root.get("@graph") match {
      case Some(l: List[_]) =>
        l.foreach(x => walk(x.asInstanceOf[Map[String, Any]]))
      case _ => walk(root - "@context")
    }
    Graph.fromQuads(spark, quads.result())
  }
}
