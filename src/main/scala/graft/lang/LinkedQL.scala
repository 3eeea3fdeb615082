package graft.lang

import graft.core.{Formats, Graph, QValue}
import graft.exec.Exec
import graft.path.Path
import graft.shape.ValueFilter
import graft.shape.ValueFilter._

/** LinkedQL front-end (/root/reference/query/linkedql/ and its steps
  * directory): the
  * RPC-able mirror of the Path API — queries are JSON-LD step objects
  * (`{"@type": "Visit", "from": {...}, "properties": [...]}`) that compile
  * to Path chains; a handful of "final" steps (Select, Documents, Count)
  * control result assembly.
  *
  * Step vocabulary implemented = the reference's test-cases corpus:
  * Vertex, Match, Visit/Out/View, VisitReverse/In, Both, As, Back,
  * Intersect, Union, Difference, Has, HasReverse, Where (+Placeholder),
  * Optional, Properties, ReverseProperties, PropertyNames,
  * ReversePropertyNames(As), Collect, Count, Order, Unique, Limit, Skip,
  * GreaterThan(Equals), LessThan(Equals), Like, RegExp, Select, Documents.
  */
object LinkedQL {
  final case class LinkedQLError(msg: String) extends Exception(msg)

  type J = Map[String, Any]

  final class Session(g: Graph) {
    /** Execute a parsed JSON query; returns a JSON-encodable tree
      * (IRIs as `{"@id": iri}`, literals as plain values).
      */
    def execute(query: J): Any = stepType(query) match {
      case "Select" =>
        val p = buildPath(sub(query, "from"))
        val want = strList(query.get("tags"))
        val rows = Exec.run(g, p).tagMaps()
          .map { m =>
            // "__"-prefixed tags are engine-internal (hasPath, Back(""))
            val visible = m.view.filterKeys(!_.startsWith("__")).toMap
            val kept = if (want.isEmpty) visible
              else visible.view.filterKeys(want.contains).toMap
            kept.map { case (k, v) => k -> renderValue(v) }
          }
          .filter(_.nonEmpty)
        rows.toList
      case "Count" =>
        List(Exec.run(g, buildPath(sub(query, "from"))).count())
      case "Documents" =>
        documents(sub(query, "from"))
      case _ =>
        val p = buildPath(query)
        Exec.run(g, p).values().map(renderValue).toList
    }

    /** Documents: one JSON-LD document per subject, properties as value
      * arrays; `Collect` sub-steps resolve rdf:first/rest chains back to
      * `{"@list": [...]}`.
      */
    private def documents(from: J): Any = stepType(from) match {
      case "Collect" =>
        val name = str(from("name"))
        val p = buildPath(sub(from, "from")).save(QValue.Iri(name), "__head")
        val heads = Exec.run(g, p).tagMaps().map(m => m("__head")).distinct
        // rdf list cells are data-proportional to the result; resolve the
        // first/rest maps once, walk driver-side
        val (firsts, rests) = listMaps()
        heads.map { h =>
          Map(name -> Map("@list" -> walkList(h, firsts, rests))): Any
        }.toList
      case _ =>
        val p = buildPath(from)
        val rows = Exec.run(g, p).tagMaps(includeTopLevel = true)
        val grouped = rows.groupBy(_("id"))
        grouped.toSeq.sortBy(x => x._1.sortKey).flatMap { case (id, rs) =>
          val props = rs.flatMap(_.toSeq)
            .filter(kv => kv._1 != "id" && !kv._1.startsWith("__"))
            .groupBy(_._1).map { case (k, vs) =>
              k -> vs.map(v => renderValue(v._2)).distinct.toList
            }
          if (props.isEmpty) None // a document needs at least one property
          else {
            val idPart: J = id match {
              case QValue.BNode(_) => Map.empty
              case other           => Map("@id" -> strip(other.sortKey))
            }
            Some((idPart ++ props): Any)
          }
        }.toList match {
          case docs => Map("@graph" -> docs)
        }
    }

    private def listMaps(): (Map[QValue, QValue], Map[QValue, QValue]) = {
      def edges(pred: String): Map[QValue, QValue] =
        Exec.run(g, Path.start().save(QValue.Iri(pred), "__v").tag("__s"))
          .tagMaps().map(m => (m("__s"), m("__v"))).toMap
      (edges(Formats.RdfFirst), edges(Formats.RdfRest))
    }

    private def walkList(head: QValue, firsts: Map[QValue, QValue],
                         rests: Map[QValue, QValue]): List[Any] = {
      var cur = head
      val out = List.newBuilder[Any]
      var guard = 0
      while (cur != QValue.Iri(Formats.RdfNil) && guard < 100000) {
        firsts.get(cur).foreach(v => out += renderValue(v))
        cur = rests.getOrElse(cur, QValue.Iri(Formats.RdfNil))
        guard += 1
      }
      out.result()
    }

    // ------------------------------------------------------------ builder
    private[lang] def buildPath(q: J): Path = stepType(q) match {
      case "Vertex" => Path.start(valueList(q.get("values")): _*)
      case "Placeholder" => Path.morphism()
      case "Match" =>
        val pattern = q.get("pattern") match {
          case Some(m: Map[_, _]) => m.asInstanceOf[J]
          case _                  => Map.empty[String, Any]
        }
        val base = pattern.get("@id") match {
          case Some(id: String) => Path.start(QValue.Iri(id))
          case _                => Path.start()
        }
        pattern.foldLeft(base) {
          case (p, ("@id", _)) => p
          case (p, (pred, v)) => p.has(QValue.Iri(pred), value(v))
        }
      case "Visit" | "View" | "Out" =>
        val vs = props(q)
        val p = buildPath(sub(q, "from"))
        if (vs.isEmpty) p.out() else p.out(vs: _*)
      case "VisitReverse" | "ViewReverse" | "In" =>
        val vs = props(q)
        val p = buildPath(sub(q, "from"))
        if (vs.isEmpty) p.in() else p.in(vs: _*)
      case "Both" => buildPath(sub(q, "from")).both(props(q): _*)
      case "As" => buildPath(sub(q, "from")).tag(str(q("name")))
      case "Back" =>
        val name = q.get("name").map(str).getOrElse("")
        if (name.nonEmpty) buildPath(sub(q, "from")).back(name)
        else {
          // Back("") re-roots at the chain's start: tag the root
          val inner = buildPath(sub(q, "from"))
          inner.copy(steps =
            graft.path.Step.Tag(Seq("__back0")) +: inner.steps).back("__back0")
        }
      case "Intersect" =>
        subSteps(q).foldLeft(buildPath(sub(q, "from")))((p, s) => p.and(buildPath(s)))
      case "Union" =>
        subSteps(q).foldLeft(buildPath(sub(q, "from")))((p, s) => p.or(buildPath(s)))
      case "Difference" =>
        subSteps(q).foldLeft(buildPath(sub(q, "from")))((p, s) => p.except(buildPath(s)))
      case "Has" =>
        buildPath(sub(q, "from")).has(QValue.Iri(str(q("property"))),
          valueList(q.get("values")): _*)
      case "HasReverse" =>
        buildPath(sub(q, "from")).hasReverse(QValue.Iri(str(q("property"))),
          valueList(q.get("values")): _*)
      case "Where" =>
        buildPath(sub(q, "from")).hasPath(buildPath(sub(q, "condition")))
      case "Optional" =>
        buildPath(sub(q, "from")).optional(buildPath(sub(q, "step")))
      case "Properties" =>
        strList(q.get("names")).foldLeft(buildPath(sub(q, "from")))(
          (p, n) => p.saveOptional(QValue.Iri(n), n))
      case "ReverseProperties" =>
        strList(q.get("names")).foldLeft(buildPath(sub(q, "from")))(
          (p, n) => p.saveOptionalReverse(QValue.Iri(n), n))
      // steps/labels.go — quad labels of the nodes' in/out edges
      case "Labels" => buildPath(sub(q, "from")).labels()
      case "PropertyNames" => buildPath(sub(q, "from")).outPredicates()
      case "ReversePropertyNames" => buildPath(sub(q, "from")).inPredicates()
      case "PropertyNamesAs" =>
        buildPath(sub(q, "from")).savePredicates(rev = false, str(q("tag")))
      case "ReversePropertyNamesAs" =>
        buildPath(sub(q, "from")).savePredicates(rev = true, str(q("tag")))
      case "GreaterThan" =>
        buildPath(sub(q, "from")).filter(Comparison(GT, value(q("value"))))
      case "GreaterThanEquals" =>
        buildPath(sub(q, "from")).filter(Comparison(GTE, value(q("value"))))
      case "LessThan" =>
        buildPath(sub(q, "from")).filter(Comparison(LT, value(q("value"))))
      case "LessThanEquals" =>
        buildPath(sub(q, "from")).filter(Comparison(LTE, value(q("value"))))
      case "Like" =>
        buildPath(sub(q, "from")).filter(
          ValueFilter.Wildcard(str(q("likePattern"))))
      case "RegExp" =>
        val refs = q.get("includeIRIs").contains(true)
        buildPath(sub(q, "from")).filter(
          ValueFilter.Regexp(str(q("expression")), refs))
      case "Limit" => buildPath(sub(q, "from")).limit(long(q("limit")))
      case "Skip" => buildPath(sub(q, "from")).skip(long(q("offset")))
      case "Order" => buildPath(sub(q, "from")).order()
      case "Unique" => buildPath(sub(q, "from")).unique()
      case "Count" =>
        buildPath(sub(q, "from")).count()
      case other => throw LinkedQLError(s"unknown step @type: $other")
    }

    // ------------------------------------------------------------ helpers
    private def stepType(q: J): String = q.get("@type") match {
      case Some(s: String) => s.stripPrefix("http://cayley.io/linkedql#")
      case _ => throw LinkedQLError(s"step has no @type: $q")
    }

    private def sub(q: J, key: String): J = q.get(key) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[J]
      case _ => throw LinkedQLError(s"step ${stepType(q)} needs '$key'")
    }

    private def subSteps(q: J): Seq[J] = q.get("steps") match {
      case Some(l: List[_]) => l.map(_.asInstanceOf[J])
      case _                => Nil
    }

    private def str(v: Any): String = v match {
      case s: String => s
      case m: Map[_, _] =>
        m.asInstanceOf[J].get("@id").map(String.valueOf(_)).getOrElse(
          throw LinkedQLError(s"expected string, got $m"))
      case other => String.valueOf(other)
    }

    private def strList(v: Option[Any]): Seq[String] = v match {
      case Some(l: List[_]) => l.map(str)
      case Some(one)        => Seq(str(one))
      case None             => Nil
    }

    /** "properties" field: a property IRI, list of IRIs, or absent (any). */
    private def props(q: J): Seq[QValue] =
      strList(q.get("properties")).map(QValue.Iri(_))

    private def value(v: Any): QValue = v match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[J]
        mm.get("@id") match {
          case Some(id: String) => QValue.Iri(id)
          case _ => mm.get("@value") match {
            case Some(x) => value(x)
            case None => throw LinkedQLError(s"cannot decode value $m")
          }
        }
      case s: String  => QValue.Str(s)
      case i: BigInt  => QValue.IntV(i.toLong)
      case i: Int     => QValue.IntV(i.toLong)
      case l: Long    => QValue.IntV(l)
      case d: Double  => QValue.FloatV(d)
      case b: Boolean => QValue.BoolV(b)
      case other => throw LinkedQLError(s"cannot decode value $other")
    }

    private def valueList(v: Option[Any]): Seq[QValue] = v match {
      case Some(l: List[_]) => l.map(value)
      case Some(one)        => Seq(value(one))
      case None             => Nil
    }

    private def long(v: Any): Long = v match {
      case i: BigInt => i.toLong
      case i: Int    => i.toLong
      case l: Long   => l
      case d: Double => d.toLong
      case other => throw LinkedQLError(s"expected number, got $other")
    }

    private def strip(sk: String): String =
      if (sk.startsWith("<") && sk.endsWith(">")) sk.substring(1, sk.length - 1)
      else sk

    /** QValue → JSON-encodable (IRIs as `{"@id": ...}`). */
    private def renderValue(v: QValue): Any = v match {
      case QValue.Iri(i)   => Map("@id" -> i)
      case QValue.BNode(b) => Map("@id" -> ("_:" + b))
      case QValue.Str(s)   => s
      case QValue.IntV(i)  => i
      case QValue.FloatV(d) => d
      case QValue.BoolV(b) => b
      case other           => other.sortKey
    }
  }

  def session(g: Graph): Session = new Session(g)

  /** Parse a JSON query string and execute. */
  def execute(g: Graph, json: String): Any =
    session(g).execute(org.json4s.jackson.JsonMethods.parse(json).values
      .asInstanceOf[Map[String, Any]])
}
