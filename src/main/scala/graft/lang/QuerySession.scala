package graft.lang

import graft.core.Graph

/** The reference's session protocol
  * (/root/reference/query/session.go:37-76): every query language executes
  * through `Execute(lang, query, Options{Limit, Collation})`; collations
  * Raw/REPL/JSON/JSONLD control the result encoding. Language registry
  * mirrors `RegisterLanguage` (session.go:99-102).
  */
object QuerySession {
  sealed trait Collation
  object Collation {
    /** Query-native maps/values (session.go Raw). */
    case object Raw extends Collation
    /** One display string per result row (CLI). */
    case object REPL extends Collation
    /** JSON-encodable maps/arrays/values (the HTTP default). */
    case object JSON extends Collation
    /** JSON-LD-flavored: IRIs become `{"@id": ...}` objects. */
    case object JSONLD extends Collation
  }

  final case class Options(limit: Int = -1,
                           collation: Collation = Collation.JSON)

  final case class UnsupportedLanguage(lang: String)
      extends Exception(s"unsupported query language: $lang")

  val languages: Seq[String] = Seq("gizmo", "graphql", "mql")

  /** Execute `query` in `lang` against `g`. The result is a JSON-encodable
    * tree: a list of row maps (gizmo/mql), or a single object (graphql);
    * REPL collation turns each row into a display string.
    */
  def execute(g: Graph, lang: String, query: String, opt: Options = Options()): Any = {
    val raw: Any = lang.toLowerCase match {
      case "gizmo" =>
        Gizmo.session(g).execute(query, opt.limit).toList
      case "graphql" =>
        // served path: default page size AND a hard ceiling on explicit
        // `first` — no HTTP request can driver-materialize an unbounded
        // level; caps that fire surface as `"truncated": true`
        GraphQL.session(g, GraphQL.DefaultFirst, GraphQL.MaxFirst)
          .execute(query)
      case "mql" =>
        val rows = MQL.session(g).execute(query)
        (if (opt.limit > 0) rows.take(opt.limit) else rows).toList
      case other => throw UnsupportedLanguage(other)
    }
    opt.collation match {
      case Collation.Raw | Collation.JSON => raw
      case Collation.REPL => replStrings(raw)
      case Collation.JSONLD => jsonLd(raw)
    }
  }

  private def replStrings(v: Any): Any = v match {
    case l: List[_] => l.map(row => replRow(row))
    case other      => replRow(other)
  }
  private def replRow(row: Any): String = row match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => s"$k : $x" }.mkString("; ")
    case other => String.valueOf(other)
  }

  /** IRIs (rendered `<iri>`) become `{"@id": iri}` objects, recursively. */
  private def jsonLd(v: Any): Any = v match {
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].map { case (k, x) => k -> jsonLd(x) }
    case l: List[_] => l.map(jsonLd)
    case s: String if s.length > 1 && s.startsWith("<") && s.endsWith(">") =>
      Map("@id" -> s.substring(1, s.length - 1))
    case other => other
  }

  /** Minimal JSON writer for the collated result trees (maps, lists,
    * strings, numbers, booleans, null).
    */
  def toJson(v: Any): String = v match {
    case null       => "null"
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
        .map { case (k, x) => jsonStr(k) + ":" + toJson(x) }
        .mkString("{", ",", "}")
    case l: Seq[_]  => l.map(toJson).mkString("[", ",", "]")
    case s: String  => jsonStr(s)
    case b: Boolean => b.toString
    case n: Int     => n.toString
    case n: Long    => n.toString
    case n: Double  => if (n == n.floor && !n.isInfinite) n.toLong.toString else n.toString
    case other      => jsonStr(String.valueOf(other))
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
