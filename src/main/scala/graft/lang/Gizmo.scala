package graft.lang

import graft.core.{Graph, NQuads, QValue}
import graft.exec.Exec
import graft.path.{Path, Via}
import graft.shape.ValueFilter
import graft.shape.ValueFilter._

/** Gizmo-style front-end: the reference's primary query surface is
  * JavaScript hosting the traversal API
  * (/root/reference/query/gizmo/gizmo.go:85-121). Embedding a JS engine is
  * out of scope (SURVEY §7.4); this parses the fluent-chain subset the
  * Gizmo corpus actually uses — `var x = g.V(...)....` statements, method
  * chains, `g.M()` morphisms, value builders (iri/bnode/gt/lt/regex/like)
  * and finals (all/getLimit/count/toArray/tagArray/toValue/tagValue).
  * Arbitrary JS (functions, forEach, emit) raises a parse error.
  *
  * Method surface mirrors /root/reference/query/gizmo/traversals.go; both
  * capitalizations accepted (`All`/`all`), as upstream does.
  */
object Gizmo {
  final case class GizmoError(msg: String) extends Exception(msg)

  // ----------------------------------------------------------- tokenizer
  private sealed trait Tok
  private case class TIdent(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TNum(s: String) extends Tok
  private case class TPunct(c: Char) extends Tok

  private def tokenize(q: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '/' && i + 1 < n && q.charAt(i + 1) == '/') {
        while (i < n && q.charAt(i) != '\n') i += 1
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && q.charAt(i) != quote) {
          if (q.charAt(i) == '\\' && i + 1 < n) {
            sb.append(q.charAt(i + 1)); i += 2
          } else { sb.append(q.charAt(i)); i += 1 }
        }
        if (i >= n) throw GizmoError("unterminated string")
        i += 1
        toks += TStr(sb.toString)
      } else if (c.isLetter || c == '_' || c == '$') {
        val start = i
        while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_' || q.charAt(i) == '$')) i += 1
        toks += TIdent(q.substring(start, i))
      } else if (c.isDigit || (c == '-' && i + 1 < n && q.charAt(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (q.charAt(i).isDigit || q.charAt(i) == '.' ||
          q.charAt(i) == 'e' || q.charAt(i) == 'E')) i += 1
        toks += TNum(q.substring(start, i))
      } else if ("().,;=[]".indexOf(c) >= 0) {
        toks += TPunct(c); i += 1
      } else throw GizmoError(s"unexpected character '$c' (full JavaScript is not supported; use the fluent-chain subset)")
    }
    toks.result()
  }

  // ------------------------------------------------------- parsed values
  private sealed trait GVal
  private case class GPath(p: Path) extends GVal
  private case class GValue(v: QValue) extends GVal
  private case class GFilter(f: ValueFilter) extends GVal
  private case class GArr(vs: Seq[GVal]) extends GVal
  private case class GNumV(d: Double, isInt: Boolean) extends GVal
  private case class GBoolV(b: Boolean) extends GVal
  private case class GResult(rows: Seq[Map[String, String]]) extends GVal
  private case class GTagMap(m: Map[String, QValue]) extends GVal
  private case object GNull extends GVal
  private case object GEnv extends GVal

  // ----------------------------------------------------------- evaluator
  final class Session(g: Graph) {
    def execute(query: String, limit: Int = -1): Seq[Map[String, String]] = {
      val toks = tokenize(query)
      var pos = 0
      val vars = scala.collection.mutable.Map.empty[String, GVal]
      var out = Seq.empty[Map[String, String]]

      def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
      def next(): Tok = { val t = toks(pos); pos += 1; t }
      def expect(c: Char): Unit = next() match {
        case TPunct(`c`) =>
        case other       => throw GizmoError(s"expected '$c', got $other")
      }

      def strToValue(s: String): QValue = NQuads.parseTermOrString(s)

      def parseArgs(): Seq[GVal] = {
        expect('(')
        val args = Vector.newBuilder[GVal]
        var first = true
        while (!peek.contains(TPunct(')'))) {
          if (!first) expect(',')
          first = false
          args += parseExpr()
        }
        expect(')')
        args.result()
      }

      def valuesOf(args: Seq[GVal]): Seq[QValue] = args.flatMap {
        case GNull          => Nil
        case GValue(v)      => Seq(v)
        case GArr(vs)       => valuesOf(vs)
        case GNumV(d, true) => Seq(QValue.IntV(d.toLong))
        case GNumV(d, _)    => Seq(QValue.FloatV(d))
        case GBoolV(b)      => Seq(QValue.BoolV(b))
        case other => throw GizmoError(s"expected value argument, got $other")
      }

      // Gizmo signature: out(predicate(s), tag(s)?) — the second argument,
      // when present, is always tags (traversals.go out/in/both).
      def viaOf(args: Seq[GVal]): (Via, Seq[String]) = {
        def viaFrom(v: GVal): Via = v match {
          case GPath(p) => Via.Sub(p)
          case GNull    => Via.All
          case other    => Via.Values(valuesOf(Seq(other)))
        }
        args match {
          case Seq()    => (Via.All, Nil)
          case Seq(one) => (viaFrom(one), Nil)
          case Seq(one, rest @ _*) =>
            (viaFrom(one),
              valuesOf(rest).collect { case QValue.Str(t) => t })
        }
      }

      def render(v: QValue): String = v.sortKey

      def call(recv: GVal, name0: String, args: Seq[GVal]): GVal = {
        val name = if (name0.isEmpty) name0
          else name0.charAt(0).toLower + name0.substring(1)
        (recv, name) match {
          case (GEnv, "v" | "vertex") => GPath(Path.start(valuesOf(args): _*))
          case (GEnv, "m" | "morphism") => GPath(Path.morphism())
          case (GEnv, "iRI" | "iri") =>
            GValue(QValue.Iri(argStr(args)))
          case (GEnv, "bnode") => GValue(QValue.BNode(argStr(args)))
          case (GEnv, "str") => GValue(QValue.Str(argStr(args)))
          case (GEnv, "emit") =>
            throw GizmoError("g.emit requires full JavaScript; unsupported")
          case (GPath(p), m) => pathCall(p, m, args)
          case (GTagMap(tm), field) if args.isEmpty =>
            tm.get(field).map(GValue(_)).getOrElse(GNull)
          case (recv, m) => throw GizmoError(s"cannot call .$m on $recv")
        }
      }

      def argStr(args: Seq[GVal]): String = args match {
        case Seq(GValue(QValue.Str(s))) => s
        case Seq(GValue(v))             => v.sortKey
        case other => throw GizmoError(s"expected one string arg, got $other")
      }

      def filtersOf(args: Seq[GVal]): Seq[ValueFilter] = args.map {
        case GFilter(f) => f
        case other      => throw GizmoError(s"expected filter, got $other")
      }

      def pathCall(p: Path, m: String, args: Seq[GVal]): GVal = m match {
        case "is" => GPath(p.is(valuesOf(args): _*))
        case "out" =>
          val (via, tags) = viaOf(args)
          GPath(p.copy(steps = p.steps :+ graft.path.Step.Out(via, tags)))
        case "in" =>
          val (via, tags) = viaOf(args)
          GPath(p.copy(steps = p.steps :+ graft.path.Step.In(via, tags)))
        case "both" =>
          val (via, tags) = viaOf(args)
          GPath(p.copy(steps = p.steps :+ graft.path.Step.Both(via, tags)))
        case "follow"         => GPath(p.follow(argPath(args)))
        case "followR" | "followReverse" => GPath(p.followReverse(argPath(args)))
        case "followRecursive" =>
          val depth = args.collectFirst { case GNumV(d, true) => d.toInt }.getOrElse(0)
          args.head match {
            case GValue(v)  => GPath(p.followRecursive(v, depth))
            case GPath(sub) => GPath(p.followRecursive(sub, depth))
            case other      => throw GizmoError(s"bad followRecursive arg $other")
          }
        case "and" | "intersect" => GPath(p.and(argPath(args)))
        case "or" | "union"      => GPath(p.or(argPath(args)))
        case "back"              => GPath(p.back(argStr(args)))
        case "tag" | "as" =>
          GPath(valuesOf(args).collect { case QValue.Str(t) => t }
            .foldLeft(p)((pp, t) => pp.tag(t)))
        case "has" =>
          val via = valuesOf(Seq(args.head)).head
          val (fs, vals) = args.tail.partition(_.isInstanceOf[GFilter])
          if (fs.nonEmpty) GPath(p.hasFilter(via, rev = false, filtersOf(fs): _*))
          else GPath(p.has(via, valuesOf(vals): _*))
        case "hasR" =>
          val via = valuesOf(Seq(args.head)).head
          GPath(p.hasReverse(via, valuesOf(args.tail): _*))
        case "save" =>
          val vs = valuesOf(args)
          val tag = vs.lift(1).collect { case QValue.Str(t) => t }
            .getOrElse(defaultTag(vs.head))
          GPath(p.save(vs.head, tag))
        case "saveR" =>
          val vs = valuesOf(args)
          val tag = vs.lift(1).collect { case QValue.Str(t) => t }
            .getOrElse(defaultTag(vs.head))
          GPath(p.saveReverse(vs.head, tag))
        case "saveOpt" | "saveOptional" =>
          val vs = valuesOf(args)
          val tag = vs.lift(1).collect { case QValue.Str(t) => t }
            .getOrElse(defaultTag(vs.head))
          GPath(p.saveOptional(vs.head, tag))
        case "saveOptR" =>
          val vs = valuesOf(args)
          val tag = vs.lift(1).collect { case QValue.Str(t) => t }
            .getOrElse(defaultTag(vs.head))
          GPath(p.saveOptionalReverse(vs.head, tag))
        case "except" | "difference" => GPath(p.except(argPath(args)))
        case "unique"                => GPath(p.unique())
        case "labels"                => GPath(p.labels())
        case "inPredicates"          => GPath(p.inPredicates())
        case "outPredicates"         => GPath(p.outPredicates())
        case "saveInPredicates" =>
          GPath(p.savePredicates(rev = true, argStr(args)))
        case "saveOutPredicates" =>
          GPath(p.savePredicates(rev = false, argStr(args)))
        case "labelContext" =>
          GPath(p.labelContext(valuesOf(args): _*))
        case "filter" => GPath(p.filter(filtersOf(args): _*))
        case "skip"   => GPath(p.skip(argInt(args)))
        case "limit"  => GPath(p.limit(argInt(args)))
        case "order"  => GPath(p.order())
        // finals
        case "all"      => GResult(rows(p, limit))
        case "getLimit" => GResult(rows(p, argInt(args).toInt))
        case "count" =>
          GResult(Seq(Map("count" -> Exec.run(g, p).count().toString)))
        case "toArray" =>
          val lim = args.headOption.map(_ => argInt(args).toInt).getOrElse(-1)
          GResult(rows(p, lim).map(m => Map("id" -> m("id"))))
        case "tagArray" =>
          val lim = args.headOption.map(_ => argInt(args).toInt).getOrElse(-1)
          GResult(rows(p, lim))
        case "toValue" =>
          Exec.run(g, p.limit(1)).values().headOption
            .map(GValue(_)).getOrElse(GNull)
        case "tagValue" =>
          val limited = p.limit(1).tag("id")
          Exec.run(g, limited).tagMaps().headOption
            .map(GTagMap(_)).getOrElse(GNull)
        case "forEach" | "map" =>
          throw GizmoError(s".$m requires full JavaScript; unsupported")
        case other => throw GizmoError(s"unknown traversal .$other")
      }

      def addHop(p: Path, via: Via, rev: Boolean): Path =
        p.copy(steps = p.steps :+
          (if (rev) graft.path.Step.In(via, Nil) else graft.path.Step.Out(via, Nil)))

      def defaultTag(v: QValue): String = v.sortKey

      def argPath(args: Seq[GVal]): Path = args match {
        case Seq(GPath(p)) => p
        case other         => throw GizmoError(s"expected path arg, got $other")
      }
      def argInt(args: Seq[GVal]): Long = args match {
        case Seq(GNumV(d, _)) => d.toLong
        case other            => throw GizmoError(s"expected number, got $other")
      }

      def rows(p: Path, lim: Int): Seq[Map[String, String]] = {
        val limited = if (lim > 0) p.limit(lim) else p
        Exec.run(g, limited.tag("id")).tagMaps()
          .map(_.map { case (k, v) => k -> render(v) })
      }

      def parsePrimary(): GVal = next() match {
        case TIdent("g")     => GEnv
        case TIdent("var")   => throw GizmoError("internal: var in expr")
        case TIdent("true")  => GBoolV(true)
        case TIdent("false") => GBoolV(false)
        case TIdent("null")  => GNull
        case TIdent(fn) if peek.contains(TPunct('(')) =>
          val args = parseArgs()
          fn match {
            case "iri" | "Iri" | "IRI" => GValue(QValue.Iri(argStrTop(args)))
            case "bnode"               => GValue(QValue.BNode(argStrTop(args)))
            case "str"                 => GValue(QValue.Str(argStrTop(args)))
            case "gt"  => GFilter(Comparison(GT, valuesOf(args).head))
            case "gte" => GFilter(Comparison(GTE, valuesOf(args).head))
            case "lt"  => GFilter(Comparison(LT, valuesOf(args).head))
            case "lte" => GFilter(Comparison(LTE, valuesOf(args).head))
            case "regex" =>
              val pat = args.head match {
                case GValue(QValue.Str(s)) => s
                case other => throw GizmoError(s"regex() expects a string, got $other")
              }
              val refs = args.lift(1).contains(GBoolV(true))
              GFilter(Regexp(pat, refs))
            case "like" => GFilter(Wildcard(argStrTop(args)))
            case other  => throw GizmoError(s"unknown function $other()")
          }
        case TIdent(name) =>
          vars.getOrElse(name, throw GizmoError(s"undefined variable $name"))
        case TStr(s) => GValue(strToValue(s))
        case TNum(s) =>
          if (s.matches("-?\\d+")) GNumV(s.toDouble, isInt = true)
          else GNumV(s.toDouble, isInt = false)
        case TPunct('[') =>
          val vs = Vector.newBuilder[GVal]
          var first = true
          while (!peek.contains(TPunct(']'))) {
            if (!first) expect(',')
            first = false
            vs += parseExpr()
          }
          expect(']')
          GArr(vs.result())
        case other => throw GizmoError(s"unexpected token $other")
      }

      def argStrTop(args: Seq[GVal]): String = args match {
        case Seq(GValue(QValue.Str(s))) => s
        case other => throw GizmoError(s"expected string arg, got $other")
      }

      def parseExpr(): GVal = {
        var v = parsePrimary()
        while (peek.contains(TPunct('.'))) {
          next() // '.'
          val name = next() match {
            case TIdent(s) => s
            case other     => throw GizmoError(s"expected method name, got $other")
          }
          val args = if (peek.contains(TPunct('('))) parseArgs() else Seq()
          v = call(v, name, args)
        }
        v
      }

      while (pos < toks.length) {
        peek match {
          case Some(TPunct(';')) => next()
          case Some(TIdent("var")) =>
            next()
            val name = next() match {
              case TIdent(s) => s
              case other     => throw GizmoError(s"expected name, got $other")
            }
            expect('=')
            vars(name) = parseExpr()
          case Some(TIdent(name))
            if pos + 1 < toks.length && toks(pos + 1) == TPunct('=') =>
            next(); next()
            vars(name) = parseExpr()
          case Some(_) =>
            parseExpr() match {
              case GResult(r) => out = out ++ r
              case _          => // expression without final: no output
            }
          case None =>
        }
      }
      out
    }
  }

  def session(g: Graph): Session = new Session(g)
}
