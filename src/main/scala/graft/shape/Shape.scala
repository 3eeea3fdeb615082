package graft.shape

import graft.core.QValue
import org.apache.spark.sql.DataFrame

/** Quad direction (the reference's `quad.Direction`; accessors
  * /root/reference/query/shape/shape.go:156-193).
  */
sealed abstract class Dir(val colName: String)
object Dir {
  case object S extends Dir("s")
  case object P extends Dir("p")
  case object O extends Dir("o")
  case object L extends Dir("l")
}

/** Value-level predicates (the reference's shape.ValueFilter family:
  * Comparison /root/reference/query/shape/shape.go:333-343, Regexp :345-360,
  * Wildcard :362-407). Comparison semantics are within-type only
  * (/root/reference/graph/iterator/value_comparison.go:62-100).
  */
sealed trait ValueFilter
object ValueFilter {
  sealed trait CmpOp
  case object LT extends CmpOp
  case object LTE extends CmpOp
  case object GT extends CmpOp
  case object GTE extends CmpOp

  final case class Comparison(op: CmpOp, value: QValue) extends ValueFilter
  /** `withRefs` opts IRIs/BNodes into the match (reference
    * /root/reference/graph/iterator/regex.go).
    */
  final case class Regexp(pattern: String, withRefs: Boolean) extends ValueFilter
  /** `%` / `?` wildcard pattern (translated to regex, shape.go:372-394). */
  final case class Wildcard(pattern: String) extends ValueFilter
}

/** The logical algebra — a 1:1 re-expression of the reference's
  * `query/shape` (shape.go:230-1476). This is the only IR: query front-ends
  * build Shapes, `Lower` turns a Shape into a DataFrame plan, Catalyst does
  * the physical planning. Node-set shapes carry an implicit working set of
  * `(id, tag…)` rows; `Quads` is the one quad-set shape.
  */
sealed trait Shape

object Shape {
  /** All nodes in the dictionary (shape.go:230-254). */
  case object AllNodes extends Shape
  /** Empty set (shape.go:230). */
  case object Null extends Shape
  /** Static value set; values resolve to ids by content hash — the
    * `Lookup`→`Fixed` fold (shape.go:815-870) is pure computation here.
    */
  final case class Fixed(values: Seq[QValue]) extends Shape
  /** An already-lowered working set (used by the recursive driver loop and
    * optional-branch evaluation; analog of `PreFetched` refs).
    */
  final case class Embed(df: DataFrame) extends Shape
  /** The local-path analog of [[Embed]]: an already-evaluated in-memory
    * working set, injected by [[LocalEval]]'s recursive driver loop.
    */
  final case class EmbedLocal(t: LocalTable) extends Shape

  /** One constraint on a quad direction (shape.go:440-459). */
  final case class QuadFilter(dir: Dir, values: Shape)
  /** Conjunction of direction constraints over the quad table
    * (shape.go:461-518). A quad-set shape: lowers to the quads table with
    * filters/joins applied, carrying any tag columns from sub-shapes.
    */
  final case class Quads(filters: Seq[QuadFilter]) extends Shape
  /** Project one direction out of a quad set — HasA (shape.go:520-620,
    * /root/reference/graph/hasa.go). Duplicate rows ARE the reference's
    * NextPath enumeration. For `L`, null labels are dropped.
    */
  final case class NodesFrom(dir: Dir, quads: Shape) extends Shape

  /** N-way intersection with optional branches (Intersect shape.go:919-1140,
    * IntersectOpt :1142-1246). Optional branches only bind tags: left-outer
    * joins that must not change required cardinality... except by
    * enumerating multiple optional matches (NextPath semantics).
    */
  final case class Intersect(sub: Seq[Shape], opt: Seq[Shape] = Nil) extends Shape
  /** Concatenation, keeps duplicates (shape.go:1248-1311). */
  final case class Union(sub: Seq[Shape]) extends Shape
  /** Set difference; `from` defaults to AllNodes (shape.go:256-292). */
  final case class Except(exclude: Shape, from: Shape = AllNodes) extends Shape
  /** Value filters over a node set (shape.go:294-331). */
  final case class Filter(from: Shape, filters: Seq[ValueFilter]) extends Shape

  /** Tag results (shape.go:1400-1432): tags are just columns. */
  final case class Save(tags: Seq[String], from: Shape) extends Shape
  /** Constant tag bindings (shape.go:771-813). */
  final case class FixedTags(tags: Map[String, QValue], on: Shape) extends Shape
  /** Re-root the working set at a previously saved tag (the Path `Back`;
    * tags-as-columns makes this a column rename, SURVEY §7.3).
    */
  final case class Back(from: Shape, tag: String) extends Shape

  final case class Unique(from: Shape) extends Shape
  /** Pagination; skip/limit <= 0 means "none" (shape.go:1313-1370). */
  final case class Page(from: Shape, skip: Long, limit: Long) extends Shape
  /** Order by value string form (sort.go: resolves via Namer then sorts). */
  final case class Sort(from: Shape) extends Shape
  /** One-row count of sub-results (shape.go:409-438); counts paths. */
  final case class Count(values: Shape) extends Shape
  /** Cache small subresults (shape.go:872-898). */
  final case class Materialize(values: Shape) extends Shape

  /** FilterQuads convenience (shape.go:1434-1449): a quad pattern from
    * optional per-direction value sets.
    */
  def filterQuads(s: Seq[QValue] = Nil, p: Seq[QValue] = Nil,
                  o: Seq[QValue] = Nil, l: Seq[QValue] = Nil): Quads =
    Quads(Seq(Dir.S -> s, Dir.P -> p, Dir.O -> o, Dir.L -> l).collect {
      case (dir, vs) if vs.nonEmpty => QuadFilter(dir, Fixed(vs))
    })

  /** Transitive closure of a morphism
    * (/root/reference/graph/iterator/recursive.go; default depth 50 at
    * :19). Lowered as an iterative frontier/seen driver loop.
    */
  final case class Recursive(from: Shape, step: Shape => Shape, maxDepth: Int,
                             depthTags: Seq[String] = Nil) extends Shape

  // ---------------------------------------------------------------------
  // Logical rewrites we own (SURVEY §4.1/§4.4): null propagation, intersect
  // flattening, page merging. Join order, pushdown, pruning are Catalyst's.
  // ---------------------------------------------------------------------
  def optimize(s: Shape): Shape = s match {
    case Fixed(vs) if vs.isEmpty => Null
    case Quads(fs) =>
      val ofs = fs.map(f => f.copy(values = optimize(f.values)))
      // a Null constraint on any direction (label included) empties the set
      if (ofs.exists(_.values == Null)) Null
      else Quads(ofs.filterNot(_.values == AllNodes))
    case NodesFrom(d, q) => optimize(q) match {
      case Null => Null
      case oq   => NodesFrom(d, oq)
    }
    case Intersect(sub, opt) =>
      val flat = sub.map(optimize).flatMap {
        case Intersect(s2, Nil) => s2
        case other              => Seq(other)
      }
      val oopt = opt.map(optimize)
      if (flat.contains(Null)) Null
      else {
        // AllNodes is the identity of intersection (shape.go:994-997);
        // Fixed branches first so lowering turns them into literal filters.
        val useful = flat.filterNot(_ == AllNodes)
        val (fixed, rest) = useful.partition(_.isInstanceOf[Fixed])
        val ordered = fixed ++ rest
        if (ordered.isEmpty && oopt.isEmpty) AllNodes
        else if (ordered.size == 1 && oopt.isEmpty) ordered.head
        else Intersect(if (ordered.isEmpty) Seq(AllNodes) else ordered, oopt)
      }
    case Union(sub) =>
      val flat = sub.map(optimize).filterNot(_ == Null)
      if (flat.isEmpty) Null
      else if (flat.size == 1) flat.head
      else Union(flat)
    case Except(ex, from) => (optimize(ex), optimize(from)) match {
      case (_, Null)    => Null
      case (Null, f)    => f
      case (e, f)       => Except(e, f)
    }
    case Filter(from, fs) => optimize(from) match {
      case Null => Null
      case f    => if (fs.isEmpty) f else Filter(f, fs)
    }
    case Save(tags, from) => optimize(from) match {
      case Null => Null
      case f    => if (tags.isEmpty) f else Save(tags, f)
    }
    case FixedTags(tags, on) => optimize(on) match {
      case Null => Null
      case f    => if (tags.isEmpty) f else FixedTags(tags, f)
    }
    case Back(from, tag) => optimize(from) match {
      case Null => Null
      case f    => Back(f, tag)
    }
    case Unique(from) => optimize(from) match {
      case Null      => Null
      case Unique(f) => Unique(f)
      case f         => Unique(f)
    }
    case Page(from, skip, limit) => optimize(from) match {
      case Null => Null
      case Page(f, s2, l2) => // merge pages (ApplyPage, shape.go:1356-1370)
        val newSkip = s2 + math.max(skip, 0)
        val newLimit =
          if (l2 <= 0) limit
          else if (limit <= 0) math.max(l2 - math.max(skip, 0), 0)
          else math.min(math.max(l2 - math.max(skip, 0), 0), limit)
        Page(f, newSkip, newLimit)
      case f =>
        if (skip <= 0 && limit <= 0) f else Page(f, skip, limit)
    }
    case Sort(from) => optimize(from) match {
      case Null => Null
      case f    => Sort(f)
    }
    case Count(values) => Count(optimize(values))
    case Materialize(v) => optimize(v) match {
      case Null => Null
      case f    => Materialize(f)
    }
    case other => other
  }
}
