package graft.shape

import graft.core.{Graph, Kind, QValue}
import org.apache.spark.sql.DataFrame

import java.lang.{Long => JLong}
import scala.collection.mutable

/** Driver-local execution of the Shape algebra over an in-memory quad
  * index — the interactive fast path for point lookups on small, cached
  * graphs.
  *
  * Why it exists: Spark's per-action scheduling floor is ~100 ms-1 s, so a
  * point lookup the reference answers in ~20 ms from its memstore
  * (/root/reference/graph/memstore/quadstore.go) costs 60× more as a
  * distributed job even when the data is tiny. This evaluator is the
  * memstore analog: hash indexes per quad direction, built once from the
  * cached DataFrames, consulted by `Exec.run` only when the graph opted in
  * via `Graph.interactive()` AND its quad count is under a hard cap — at
  * 100 TB the gate never opens and every query takes the distributed path.
  *
  * Correctness contract: this is a *second implementation of the same
  * semantics* as [[Lower]], mirrored construct-for-construct (each case
  * cites the Lower line it shadows). The working set is the same shape —
  * an `id` (or `s,p,o,l`) column plus `_t_`/`_ti_` tag columns of nullable
  * longs — so column-level rules (duplicate-tag drops, semi-join for
  * tag-less probes, left-outer optional enumeration, bag multiplicity)
  * translate 1:1. Divergence is guarded three ways: the golden pathtest
  * corpus re-runs through this path (LocalPathSpec), a seeded random
  * differential spec compares both engines (LocalDifferentialSpec), and a
  * driver-gated parity entry (`g_local_parity`) does the same under the
  * oracle harness.
  */
object LocalEval {

  /** Raised when a shape needs a construct only the distributed path has
    * (e.g. an embedded DataFrame); `tryRun` converts it to a fallback.
    */
  private[shape] final class Unsupported(msg: String)
    extends RuntimeException(msg)

  /** Debug/engagement counter: number of shapes evaluated locally. */
  val evalCount = new java.util.concurrent.atomic.AtomicLong(0)

  /** Default `Graph.interactive()` cap. ~5 M quads ≈ a few hundred MB of
    * driver heap for the index — generous for an interactive store, and a
    * hard stop long before "big data".
    */
  val DefaultMaxQuads: Long = 5_000_000L

  /** Evaluate `s` locally if the graph is interactive, small enough, and
    * the shape is fully supported; None = take the distributed path.
    */
  def tryRun(g: Graph, s: Shape): Option[LocalResult] = {
    if (g.interactiveMaxQuads <= 0) return None
    LocalGraphIndex.forGraph(g, g.interactiveMaxQuads).flatMap { idx =>
      val opt = Shape.optimize(s)
      if (!supports(opt, root = true)) None
      else try {
        evalCount.incrementAndGet()
        val ev = new LocalEval(g, idx)
        opt match {
          case Shape.Count(values) =>
            // mirror Lower's pre-resolved one-row Count (Lower.scala:160)
            Some(LocalResult(idx, None, Some(ev.nodes(values).rows.size.toLong)))
          case other =>
            Some(LocalResult(idx, Some(ev.nodes(other)), None))
        }
      } catch { case _: Unsupported => None }
    }
  }

  /** Static supportability walk. `Count` is only supported at the root
    * (Lower's pre-resolved schema does not compose either); embedded
    * DataFrames are inherently distributed.
    */
  private def supports(s: Shape, root: Boolean): Boolean = s match {
    case Shape.AllNodes | Shape.Null => true
    case _: Shape.Fixed              => true
    case _: Shape.EmbedLocal         => true
    case _: Shape.Embed              => false
    case Shape.NodesFrom(_, q)       => supportsQuad(q)
    case Shape.Intersect(sub, opt2)  => (sub ++ opt2).forall(supports(_, root = false))
    case Shape.Union(sub)            => sub.forall(supports(_, root = false))
    case Shape.Except(e, f)          => supports(e, root = false) && supports(f, root = false)
    case Shape.Filter(f, _)          => supports(f, root = false)
    case Shape.Save(_, f)            => supports(f, root = false)
    case Shape.FixedTags(_, f)       => supports(f, root = false)
    case Shape.Back(f, _)            => supports(f, root = false)
    case Shape.Unique(f)             => supports(f, root = false)
    case Shape.Page(f, _, _)         => supports(f, root = false)
    case Shape.Sort(f)               => supports(f, root = false)
    case Shape.Materialize(v)        => supports(v, root = false)
    case Shape.Count(v)              => root && supports(v, root = false)
    case Shape.Recursive(from, step, _, _) =>
      supports(from, root = false) &&
        (try supports(step(Shape.Null), root = false)
        catch { case scala.util.control.NonFatal(_) => false })
    case _: Shape.Quads => false // quad shape in node position: error both ways
  }

  private def supportsQuad(s: Shape): Boolean = s match {
    case Shape.Quads(fs) => fs.forall(f => supports(f.values, root = false))
    case Shape.Union(sub) => sub.forall(supportsQuad)
    case _ => false
  }
}

/** The local working set: the exact column layout of Lower's DataFrames
  * (`id` or `s,p,o,l`, then `_t_`/`_ti_` tag columns), rows of nullable
  * longs. Keeping the physical column names identical means every
  * column-level semantic in Lower has a literal counterpart here.
  */
final class LocalTable(val cols: Vector[String],
                       val rows: IndexedSeq[Array[JLong]]) {
  def colIdx(name: String): Int = cols.indexOf(name)

  def tagCols: Vector[String] =
    cols.filter(c => c.startsWith(Lower.TagPrefix) || Lower.isIntTagCol(c))

  def select(names: Vector[String]): LocalTable = {
    val idxs = names.map(colIdx)
    require(idxs.forall(_ >= 0), s"missing column in $cols: $names")
    new LocalTable(names, rows.map(r => idxs.map(r(_)).toArray))
  }

  /** withColumn semantics: replace in place if present, else append. */
  def withCol(name: String, f: Array[JLong] => JLong): LocalTable = {
    val at = colIdx(name)
    if (at >= 0)
      new LocalTable(cols, rows.map { r =>
        val r2 = r.clone(); r2(at) = f(r); r2
      })
    else new LocalTable(cols :+ name, rows.map(r => r :+ f(r)))
  }

  def where(f: Array[JLong] => Boolean): LocalTable =
    new LocalTable(cols, rows.filter(f))

  def drop(name: String): LocalTable = {
    val at = colIdx(name)
    if (at < 0) this
    else new LocalTable(cols.patch(at, Nil, 1),
      rows.map(r => (r.take(at) ++ r.drop(at + 1))))
  }

  /** unionByName(allowMissingColumns = true). */
  def unionByName(other: LocalTable): LocalTable = {
    val allCols = cols ++ other.cols.filterNot(cols.contains)
    def pad(t: LocalTable): IndexedSeq[Array[JLong]] = {
      val idxs = allCols.map(t.colIdx)
      t.rows.map(r => idxs.map(i => if (i < 0) null else r(i)).toArray)
    }
    new LocalTable(allCols, pad(this) ++ pad(other))
  }
}

object LocalTable {
  def empty(cols: Vector[String]): LocalTable =
    new LocalTable(cols, Vector.empty)
}

/** One dictionary entry (the nodes row minus the id). */
final case class LocalNode(kind: Int, s: String, i: JLong,
                           d: java.lang.Double, b: java.lang.Boolean,
                           t: JLong, lang: String, dt: String, sk: String) {
  def toQValue: QValue = QValue.fromFields(kind, s, i, d, b, t, lang, dt)
}

/** In-memory quad index: columnar quad arrays plus one hash index per
  * direction — the memstore's QuadDirectionIndex analog
  * (/root/reference/graph/memstore/quadstore.go:125-137).
  */
final class LocalGraphIndex(val nodeById: java.util.HashMap[JLong, LocalNode],
                            val nodeIds: Array[Long],
                            val qs: Array[Long], val qp: Array[Long],
                            val qo: Array[Long], val ql: Array[JLong],
                            byS: java.util.HashMap[JLong, Array[Int]],
                            byP: java.util.HashMap[JLong, Array[Int]],
                            byO: java.util.HashMap[JLong, Array[Int]],
                            byL: java.util.HashMap[JLong, Array[Int]]) {
  def nQuads: Int = qs.length

  def dirValue(dir: Dir, quad: Int): JLong = dir match {
    case Dir.S => JLong.valueOf(qs(quad))
    case Dir.P => JLong.valueOf(qp(quad))
    case Dir.O => JLong.valueOf(qo(quad))
    case Dir.L => ql(quad)
  }

  def index(dir: Dir): java.util.HashMap[JLong, Array[Int]] = dir match {
    case Dir.S => byS
    case Dir.P => byP
    case Dir.O => byO
    case Dir.L => byL
  }

  /** Posting list for one id on one direction (empty when absent). */
  def postings(dir: Dir, id: Long): Array[Int] = {
    val a = index(dir).get(JLong.valueOf(id))
    if (a == null) Array.emptyIntArray else a
  }
}

object LocalGraphIndex {
  // Keyed on the quads DataFrame by identity: Graph.cached()/withStats()
  // keep the same Dataset reference, mutations create a new one (and so a
  // fresh index); dropped graphs let their index be collected.
  private val cache =
    new java.util.WeakHashMap[DataFrame, Option[LocalGraphIndex]]()

  def forGraph(g: Graph, maxQuads: Long): Option[LocalGraphIndex] =
    cache.synchronized {
      val key = g.quads
      val hit = cache.get(key)
      if (hit != null) hit
      else {
        val n = g.predStats.map(_.values.sum).getOrElse(g.quads.count())
        val built = if (n > maxQuads) None else Some(build(g))
        cache.put(key, built)
        built
      }
    }

  /** One collect of each table; ~(32 B + strings) per node, 32 B per quad. */
  def build(g: Graph): LocalGraphIndex = {
    import org.apache.spark.sql.functions.col
    val nodeRows = g.nodes.select(col("id"), col("kind"), col("s"), col("i"),
      col("d"), col("b"), col("t"), col("lang"), col("dt"), col("sk"))
      .collect()
    val nodeById = new java.util.HashMap[JLong, LocalNode](nodeRows.length * 2)
    val nodeIds = new Array[Long](nodeRows.length)
    var k = 0
    nodeRows.foreach { r =>
      val id = r.getLong(0)
      nodeIds(k) = id; k += 1
      nodeById.put(JLong.valueOf(id), LocalNode(r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else JLong.valueOf(r.getLong(3)),
        if (r.isNullAt(4)) null else java.lang.Double.valueOf(r.getDouble(4)),
        if (r.isNullAt(5)) null else java.lang.Boolean.valueOf(r.getBoolean(5)),
        if (r.isNullAt(6)) null else JLong.valueOf(r.getLong(6)),
        r.getString(7), r.getString(8), r.getString(9)))
    }
    val quadRows =
      g.quads.select(col("s"), col("p"), col("o"), col("l")).collect()
    val n = quadRows.length
    val qs = new Array[Long](n); val qp = new Array[Long](n)
    val qo = new Array[Long](n); val ql = new Array[JLong](n)
    var i = 0
    while (i < n) {
      val r = quadRows(i)
      qs(i) = r.getLong(0); qp(i) = r.getLong(1); qo(i) = r.getLong(2)
      ql(i) = if (r.isNullAt(3)) null else JLong.valueOf(r.getLong(3))
      i += 1
    }
    def buildIdx(get: Int => JLong): java.util.HashMap[JLong, Array[Int]] = {
      val m = new java.util.HashMap[JLong, mutable.ArrayBuffer[Int]]()
      var j = 0
      while (j < n) {
        val v = get(j)
        if (v != null) {
          var b = m.get(v)
          if (b == null) { b = mutable.ArrayBuffer.empty[Int]; m.put(v, b) }
          b += j
        }
        j += 1
      }
      val out = new java.util.HashMap[JLong, Array[Int]](m.size() * 2)
      m.forEach((key, buf) => out.put(key, buf.toArray))
      out
    }
    new LocalGraphIndex(nodeById, nodeIds, qs, qp, qo, ql,
      buildIdx(j => JLong.valueOf(qs(j))), buildIdx(j => JLong.valueOf(qp(j))),
      buildIdx(j => JLong.valueOf(qo(j))), buildIdx(j => ql(j)))
  }
}

/** Locally evaluated result: a working set, or the pre-resolved Count. */
final case class LocalResult(idx: LocalGraphIndex,
                             table: Option[LocalTable],
                             countValue: Option[Long])

/** The Shape interpreter; each case mirrors the correspondingly-numbered
  * construct in [[Lower]].
  */
private final class LocalEval(g: Graph, idx: LocalGraphIndex) {
  import Lower.{ID, intTagCol, tagCol}
  import LocalEval.Unsupported

  private val idOnly = Vector(ID)
  private def idTable(ids: IndexedSeq[JLong]): LocalTable =
    new LocalTable(idOnly, ids.map(i => Array[JLong](i)))

  // ---------------------------------------------------------------- nodes
  def nodes(s: Shape): LocalTable = s match {
    case Shape.AllNodes =>
      idTable(idx.nodeIds.toIndexedSeq.map(JLong.valueOf)) // Lower.scala:84
    case Shape.Null => LocalTable.empty(idOnly)
    case Shape.Fixed(vs) => // duplicates preserved (Lower.scala:86)
      idTable(vs.toIndexedSeq.map(v => JLong.valueOf(QValue.id(v))))
    case Shape.EmbedLocal(t) => t
    case _: Shape.Embed =>
      throw new Unsupported("embedded DataFrame")

    case Shape.NodesFrom(dir, q) => // Lower.scala:90-93
      val qt = quads(q)
      val base =
        if (dir == Dir.L) {
          val li = qt.colIdx("l")
          qt.where(r => r(li) != null)
        } else qt
      val dirIdx = base.colIdx(dir.colName)
      val keep = base.tagCols
      val keepIdx = keep.map(base.colIdx)
      new LocalTable(ID +: keep, base.rows.map { r =>
        (r(dirIdx) +: keepIdx.map(r(_))).toArray
      })

    case Shape.Intersect(sub, opt) => // Lower.scala:95-111
      val (fixed, rest) = sub.partition(_.isInstanceOf[Shape.Fixed])
      var t =
        if (rest.isEmpty) nodes(fixed.head)
        else rest.map(nodes).reduce(joinOnIdInner)
      val fixedToFilter = if (rest.isEmpty) fixed.tail else fixed
      fixedToFilter.foreach {
        case Shape.Fixed(vs) =>
          val ids = vs.map(QValue.id).toSet
          val at = t.colIdx(ID)
          t = t.where(r => r(at) != null && ids.contains(r(at).longValue()))
        case _ => ()
      }
      opt.foldLeft(t)(optionalJoin)

    case Shape.Union(sub) => // Lower.scala:113-114
      sub.map(nodes).reduce(_ unionByName _)

    case Shape.Except(ex, from) => // Lower.scala:116-117 (left_anti: null ids kept)
      val exclude = new java.util.HashSet[JLong]()
      val et = nodes(ex); val ei = et.colIdx(ID)
      et.rows.foreach(r => if (r(ei) != null) exclude.add(r(ei)))
      val ft = nodes(from); val fi = ft.colIdx(ID)
      ft.where(r => r(fi) == null || !exclude.contains(r(fi)))

    case Shape.Filter(from, fs) => // Lower.scala:119-130
      val preds = fs.map(compilePredicate)
      def pass(n: LocalNode): Boolean = preds.forall(_(n))
      from match {
        case Shape.AllNodes => // dictionary scan, no join
          idTable(idx.nodeIds.toIndexedSeq.collect {
            case id if pass(idx.nodeById.get(JLong.valueOf(id))) =>
              JLong.valueOf(id)
          })
        case _ => // left_semi against the filtered dictionary
          val t = nodes(from); val at = t.colIdx(ID)
          t.where { r =>
            r(at) != null && {
              val n = idx.nodeById.get(r(at))
              n != null && pass(n)
            }
          }
      }

    case Shape.Save(tags, from) => // Lower.scala:132-133
      val t0 = nodes(from); val at = t0.colIdx(ID)
      tags.foldLeft(t0)((t, tag) => t.withCol(tagCol(tag), r => r(at)))

    case Shape.FixedTags(tags, on) => // Lower.scala:135-138
      tags.foldLeft(nodes(on)) { case (t, (tag, v)) =>
        val id = JLong.valueOf(QValue.id(v))
        t.withCol(tagCol(tag), _ => id)
      }

    case Shape.Back(from, tag) => // Lower.scala:140-141
      val t = nodes(from); val src = t.colIdx(tagCol(tag))
      if (src < 0) throw new Unsupported(s"Back: missing tag column $tag")
      t.withCol(ID, r => r(src))

    case Shape.Unique(from) => // one row per id, nulls form one group;
      // survivor = min tag tuple (name-sorted, nulls first), mirroring
      // Lower's min(struct(...)) so the two engines agree deterministically
      val t = nodes(from); val at = t.colIdx(ID)
      val restIdx: Array[Int] = t.cols.zipWithIndex
        .filter(_._1 != ID).sortBy(_._1).map(_._2).toArray
      def less(a: Array[JLong], b: Array[JLong]): Boolean = {
        var i = 0
        while (i < restIdx.length) {
          val x = a(restIdx(i)); val y = b(restIdx(i))
          if (x == null && y != null) return true
          if (x != null && y == null) return false
          if (x != null && y != null && x.longValue != y.longValue)
            return x.longValue < y.longValue
          i += 1
        }
        false
      }
      val best = new java.util.LinkedHashMap[JLong, Array[JLong]]()
      t.rows.foreach { r =>
        val k = r(at)
        val cur = best.get(k)
        if ((cur == null && !best.containsKey(k)) || (cur != null && less(r, cur)))
          best.put(k, r)
      }
      import scala.jdk.CollectionConverters._
      new LocalTable(t.cols, best.values.asScala.toVector)

    case Shape.Page(from, skip, limit) => // Lower.scala:145-149
      val full = nodes(from)
      var rows = full.rows
      if (skip > 0) rows = rows.drop(skip.toInt)
      if (limit > 0) rows = rows.take(limit.toInt)
      new LocalTable(full.cols, rows)

    case Shape.Sort(from) => // order by precomputed sk, nulls first
      // (Lower.scala:151-158)
      val t = nodes(from); val at = t.colIdx(ID)
      def keyOf(r: Array[JLong]): String = {
        if (r(at) == null) null
        else {
          val n = idx.nodeById.get(r(at))
          if (n == null) null else n.sk
        }
      }
      new LocalTable(t.cols, t.rows.sortWith { (a, b) =>
        val ka = keyOf(a); val kb = keyOf(b)
        if (ka == null && kb == null) false
        else if (ka == null) true
        else if (kb == null) false
        else utf8Lt(ka, kb)
      })

    case Shape.Materialize(v) => nodes(v) // caching is physical-only here

    case Shape.Recursive(from, step, maxDepth, depthTags) =>
      recursive(from, step, maxDepth, depthTags)

    case Shape.Count(_) =>
      throw new Unsupported("nested Count") // root-only, see tryRun

    case q: Shape.Quads =>
      throw new IllegalArgumentException(s"quad shape in node position: $q")
  }

  // ---------------------------------------------------------------- quads
  private def quads(s: Shape): LocalTable = s match {
    case Shape.Quads(filters) => evalQuads(filters)
    case Shape.Union(sub) => sub.map(quads).reduce(_ unionByName _)
    case other =>
      throw new IllegalArgumentException(s"node shape in quad position: $other")
  }

  private val quadCols = Vector("s", "p", "o", "l")

  /** Quads(filters) — Lower.scala:180-232. Literal (Fixed) constraints are
    * applied first via the direction indexes (they commute with the other
    * filters: pure per-row predicates on immutable quad columns), seeding
    * the candidate list from the most selective direction; Save-tags and
    * sub-shape joins then run in their original order over materialized
    * rows.
    */
  private def evalQuads(filters: Seq[Shape.QuadFilter]): LocalTable = {
    // (dir, ids) literal constraints, including the filter half of
    // Save(tags, Fixed) (Lower.scala:224-226)
    val literal = mutable.ArrayBuffer.empty[(Dir, Seq[Long])]
    filters.foreach { f =>
      f.values match {
        case Shape.Fixed(vs) => literal += f.dir -> vs.map(QValue.id)
        case Shape.Save(_, Shape.Fixed(vs)) => literal += f.dir -> vs.map(QValue.id)
        case Shape.Null => literal += f.dir -> Nil
        case _ => ()
      }
    }
    // sub-shape filters evaluate FIRST (the join needs them anyway): a
    // small frontier is usually the most selective seed — `in(pred)` from
    // one node must walk that node's postings, not materialize every quad
    // of the predicate and join down (memstore iterates the same way,
    // graph/memstore/quadstore.go QuadIterator: per-value posting lists)
    val subTables = mutable.LinkedHashMap.empty[Int, LocalTable]
    filters.zipWithIndex.foreach { case (f, i) =>
      f.values match {
        case Shape.AllNodes | Shape.Null | _: Shape.Fixed
           | Shape.Save(_, Shape.AllNodes) | Shape.Save(_, _: Shape.Fixed) => ()
        case sub => subTables(i) = nodes(sub)
      }
    }
    // candidate seeds: every literal constraint, plus every sub-shape
    // frontier small enough that summing its posting lengths is free
    final case class SeedC(d: Dir, ids: Array[Long], cost: Long)
    val seeds = mutable.ArrayBuffer.empty[SeedC]
    literal.foreach { case (d, ids) =>
      seeds += SeedC(d, ids.toArray,
        ids.map(idx.postings(d, _).length.toLong).sum)
    }
    val MaxSeedFrontier = 4096
    filters.zipWithIndex.foreach { case (f, i) =>
      subTables.get(i).foreach { nt =>
        val ni = nt.colIdx(ID)
        val set = new java.util.HashSet[JLong]()
        nt.rows.foreach(r => if (r(ni) != null) set.add(r(ni)))
        if (set.size <= MaxSeedFrontier) {
          val ids = new Array[Long](set.size)
          val it = set.iterator(); var j = 0
          while (it.hasNext) { ids(j) = it.next().longValue(); j += 1 }
          seeds += SeedC(f.dir, ids,
            ids.map(idx.postings(f.dir, _).length.toLong).sum)
        }
      }
    }
    // stats folding (Lower.scala:195-201) falls out of empty postings.
    var cand: Array[Int] =
      if (seeds.isEmpty) Array.range(0, idx.nQuads)
      else {
        val s = seeds.minBy(_.cost)
        s.ids.flatMap(idx.postings(s.d, _))
      }
    // apply every literal constraint (postings per id are disjoint, so the
    // seed list has no duplicates; re-checking the seed dir is a no-op)
    literal.foreach { case (d, ids) =>
      val set = ids.toSet
      cand = cand.filter { q =>
        val v = idx.dirValue(d, q)
        v != null && set.contains(v.longValue())
      }
    }
    var t = new LocalTable(quadCols, cand.toIndexedSeq.map(q =>
      Array[JLong](JLong.valueOf(idx.qs(q)), JLong.valueOf(idx.qp(q)),
        JLong.valueOf(idx.qo(q)), idx.ql(q))))
    // now the non-literal work, in filter order
    filters.zipWithIndex.foreach { case (f, fi) =>
      val dirIdx = t.colIdx(f.dir.colName)
      f.values match {
        case Shape.AllNodes | Shape.Null | _: Shape.Fixed => ()
        case Shape.Save(tags, Shape.AllNodes) => // tag the direction, no join
          t = tags.foldLeft(t)((t2, tag) =>
            t2.withCol(tagCol(tag), r => r(dirIdx)))
        case Shape.Save(tags, _: Shape.Fixed) => // filter applied above
          t = tags.foldLeft(t)((t2, tag) =>
            t2.withCol(tagCol(tag), r => r(dirIdx)))
        case _ => // inner join quads.dir == nodes.id (Lower.scala:227-231)
          val nt = subTables(fi)
          val keep = nt.tagCols.filterNot(t.cols.contains)
          val ni = nt.colIdx(ID)
          val keepIdx = keep.map(nt.colIdx)
          val byId = new java.util.HashMap[JLong, mutable.ArrayBuffer[Array[JLong]]]()
          nt.rows.foreach { r =>
            if (r(ni) != null) {
              var b = byId.get(r(ni))
              if (b == null) {
                b = mutable.ArrayBuffer.empty[Array[JLong]]
                byId.put(r(ni), b)
              }
              b += keepIdx.map(r(_)).toArray
            }
          }
          val outRows = t.rows.flatMap { r =>
            val v = r(dirIdx)
            val ms = if (v == null) null else byId.get(v)
            if (ms == null) Nil else ms.map(tagVals => r ++ tagVals)
          }
          t = new LocalTable(t.cols ++ keep, outRows)
      }
    }
    t
  }

  // -------------------------------------------------------------- helpers
  /** joinOnId inner (Lower.scala:245-251): duplicate right tags dropped;
    * a tag-less right side is an existence probe (left semi), a
    * tag-bearing one a real inner join (bag multiplicity).
    */
  private def joinOnIdInner(left: LocalTable, right: LocalTable): LocalTable = {
    val r0 = right.tagCols.filter(left.cols.contains).foldLeft(right)(_ drop _)
    val li = left.colIdx(ID); val ri = r0.colIdx(ID)
    val rtags = r0.tagCols
    if (rtags.isEmpty) {
      val ids = new java.util.HashSet[JLong]()
      r0.rows.foreach(r => if (r(ri) != null) ids.add(r(ri)))
      left.where(r => r(li) != null && ids.contains(r(li)))
    } else {
      val keepIdx = rtags.map(r0.colIdx)
      val byId = new java.util.HashMap[JLong, mutable.ArrayBuffer[Array[JLong]]]()
      r0.rows.foreach { r =>
        if (r(ri) != null) {
          var b = byId.get(r(ri))
          if (b == null) {
            b = mutable.ArrayBuffer.empty[Array[JLong]]; byId.put(r(ri), b)
          }
          b += keepIdx.map(r(_)).toArray
        }
      }
      val rows = left.rows.flatMap { r =>
        val ms = if (r(li) == null) null else byId.get(r(li))
        if (ms == null) Nil else ms.map(tv => r ++ tv)
      }
      new LocalTable(left.cols ++ rtags, rows)
    }
  }

  /** Optional branch (Lower.scala:256-260): left outer, binds new tags
    * only, enumerates multiple matches, unmatched rows get nulls.
    */
  private def optionalJoin(left: LocalTable, optShape: Shape): LocalTable = {
    val ot = nodes(optShape)
    val keep = ot.tagCols.filterNot(left.cols.contains)
    val oi = ot.colIdx(ID)
    val keepIdx = keep.map(ot.colIdx)
    val byId = new java.util.HashMap[JLong, mutable.ArrayBuffer[Array[JLong]]]()
    ot.rows.foreach { r =>
      if (r(oi) != null) {
        var b = byId.get(r(oi))
        if (b == null) {
          b = mutable.ArrayBuffer.empty[Array[JLong]]; byId.put(r(oi), b)
        }
        b += keepIdx.map(r(_)).toArray
      }
    }
    val li = left.colIdx(ID)
    val nulls = Array.fill[JLong](keep.size)(null)
    val rows = left.rows.flatMap { r =>
      val ms = if (r(li) == null) null else byId.get(r(li))
      if (ms == null) Seq(r ++ nulls) else ms.map(tv => r ++ tv)
    }
    new LocalTable(left.cols ++ keep, rows)
  }

  /** Spark string comparison is binary over UTF-8 bytes; mirror it
    * (Java String.compareTo is UTF-16 code-unit order, which differs for
    * supplementary characters).
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val ba = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ba.length, bb.length)
    while (i < n) {
      val c = (ba(i) & 0xff) - (bb(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    ba.length - bb.length
  }
  private def utf8Lt(a: String, b: String): Boolean = utf8Cmp(a, b) < 0

  /** Value predicate over a dictionary entry — mirrors
    * Lower.filterPredicate (Lower.scala:265-301) including the within-kind
    * rule and rlike's unanchored find() semantics.
    */
  private def compilePredicate(f: ValueFilter): LocalNode => Boolean = f match {
    case ValueFilter.Comparison(op, v) =>
      import ValueFilter._
      def cmpL(x: Long, y: Long): Boolean = op match {
        case LT => x < y; case LTE => x <= y; case GT => x > y; case GTE => x >= y
      }
      def cmpD(x: Double, y: Double): Boolean = op match {
        case LT => x < y; case LTE => x <= y; case GT => x > y; case GTE => x >= y
      }
      def cmpS(x: String, y: String): Boolean = {
        val c = utf8Cmp(x, y)
        op match { case LT => c < 0; case LTE => c <= 0; case GT => c > 0; case GTE => c >= 0 }
      }
      v match {
        case QValue.IntV(x) =>
          n => n.kind == Kind.IntK && n.i != null && cmpL(n.i, x)
        case QValue.FloatV(x) =>
          n => n.kind == Kind.FloatK && n.d != null && cmpD(n.d, x)
        case QValue.Str(x) =>
          n => n.kind == Kind.Str && n.s != null && cmpS(n.s, x)
        case QValue.Iri(x) =>
          n => n.kind == Kind.Iri && n.s != null && cmpS(n.s, x)
        case QValue.BNode(x) =>
          n => n.kind == Kind.BNode && n.s != null && cmpS(n.s, x)
        case QValue.TimeV(x) =>
          n => n.kind == Kind.TimeK && n.t != null && cmpL(n.t, x)
        case other =>
          val sk = other.sortKey
          n => n.kind == other.kind && n.sk != null && cmpS(n.sk, sk)
      }
    case ValueFilter.Regexp(pattern, withRefs) =>
      val p = graft.functions.Re2.compile(pattern)
      val kinds =
        if (withRefs)
          Set(Kind.Str, Kind.LangStr, Kind.TypedStr, Kind.Iri, Kind.BNode)
        else Set(Kind.Str, Kind.LangStr, Kind.TypedStr)
      n => kinds.contains(n.kind) && n.s != null && p.matches(n.s)
    case ValueFilter.Wildcard(pattern) =>
      val regex = "^" + pattern.flatMap {
        case '%' => ".*"
        case '?' => "."
        case c if "\\.[]{}()*+-?^$|".contains(c) => "\\" + c
        case c => c.toString
      } + "$"
      val p = graft.functions.Re2.compile(regex)
      n => n.s != null && p.matches(n.s)
  }

  /** Frontier/seen transitive closure — mirrors Lower.recursive
    * (Lower.scala:312-352) step for step, with the frontier embedded as
    * local rows instead of a DataFrame.
    */
  private def recursive(from: Shape, step: Shape => Shape, maxDepth: Int,
                        depthTags: Seq[String]): LocalTable = {
    val maxD = if (maxDepth <= 0) Lower.DefaultMaxRecursive else maxDepth
    // start = nodes(from).select(ID).distinct()
    val fromT = nodes(from); val fi = fromT.colIdx(ID)
    val startIds = new java.util.LinkedHashSet[JLong]()
    var startHasNull = false
    fromT.rows.foreach { r =>
      if (r(fi) == null) startHasNull = true else startIds.add(r(fi))
    }
    import scala.jdk.CollectionConverters._
    def distinctIdTable(ids: Iterable[JLong], withNull: Boolean): LocalTable =
      idTable(ids.toIndexedSeq ++ (if (withNull) Seq(null: JLong) else Nil))
    var frontier = distinctIdTable(startIds.asScala, startHasNull)
    val emitted = new java.util.HashSet[JLong]()
    var emittedNull = false
    var acc: LocalTable = null
    var depth = 0
    var freshEmpty = frontier.rows.isEmpty
    while (depth < maxD && !freshEmpty) {
      val stepT = nodes(step(Shape.EmbedLocal(frontier)))
      val depthVal = JLong.valueOf((depth + 1).toLong)
      val tagged = depthTags.foldLeft(stepT)((t, tag) =>
        t.withCol(intTagCol(tag), _ => depthVal))
      // fresh = anti-join emitted (nulls kept), then first row per id
      val ti = tagged.colIdx(ID)
      val seen = new java.util.HashSet[JLong]()
      var seenNull = false
      val freshRows = tagged.rows.filter { r =>
        val v = r(ti)
        if (v == null) { // left_anti keeps null ids; dedup keeps first
          val first = !emittedNull && !seenNull; seenNull = true; first
        } else !emitted.contains(v) && seen.add(v)
      }
      val fresh = new LocalTable(tagged.cols, freshRows)
      freshEmpty = fresh.rows.isEmpty
      if (!freshEmpty) {
        acc = if (acc == null) fresh else acc.unionByName(fresh)
        val ai = fresh.colIdx(ID)
        fresh.rows.foreach { r =>
          if (r(ai) == null) emittedNull = true else emitted.add(r(ai))
        }
        // frontier = fresh ids not in start (null ids survive left_anti)
        val nextIds = new java.util.LinkedHashSet[JLong]()
        var nextNull = false
        fresh.rows.foreach { r =>
          if (r(ai) == null) nextNull = true
          else if (!startIds.contains(r(ai))) nextIds.add(r(ai))
        }
        frontier = distinctIdTable(nextIds.asScala, nextNull)
      }
      depth += 1
    }
    if (acc == null) LocalTable.empty(idOnly) else acc
  }
}
