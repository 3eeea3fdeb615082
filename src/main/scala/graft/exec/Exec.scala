package graft.exec

import graft.core.{Graph, QValue}
import graft.path.Path
import graft.shape.{Lower, Shape}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Finals / collation — the chain-driver analog
  * (/root/reference/graph/iterator/iterate.go): turn a lowered working set
  * into values / tag maps, resolving ids against the nodes dictionary.
  * Count results arrive pre-resolved (a `kind` column) and skip the join.
  */
final class Results(g: Graph, val df: DataFrame) {
  import Lower.{ID, TagPrefix, tagCol}

  private def isPreResolved: Boolean = df.columns.contains("kind")

  /** Resolve one id column to values, preserving row order via a
    * monotonic ordinal (orderBy survives the dictionary join).
    */
  private def resolveCol(colName: String): Seq[Option[QValue]] = {
    // alias-qualified: the working set often derives from the dictionary
    val ordered = df.withColumn("__ord", monotonically_increasing_id())
      .alias("__rl")
    val n = g.nodes.alias("__rr")
    val joined = ordered
      .join(n, col("__rl." + colName) === col("__rr.id"), "left")
      .select(col("__rl.__ord"), col("__rr.kind"), col("__rr.s"),
        col("__rr.i"), col("__rr.d"), col("__rr.b"), col("__rr.t"),
        col("__rr.lang"), col("__rr.dt"))
      .orderBy("__ord")
    joined.collect().toSeq.map { r =>
      if (r.isNullAt(1)) None
      else Some(QValue.fromFields(r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)),
        if (r.isNullAt(4)) null else java.lang.Double.valueOf(r.getDouble(4)),
        if (r.isNullAt(5)) null else java.lang.Boolean.valueOf(r.getBoolean(5)),
        if (r.isNullAt(6)) null else java.lang.Long.valueOf(r.getLong(6)),
        r.getString(7), r.getString(8)))
    }
  }

  private def preResolvedValues(): Seq[QValue] =
    df.select(col("kind"), col("s"), col("i"), col("d"), col("b"), col("t"),
      col("lang"), col("dt")).collect().toSeq.map { r =>
      QValue.fromFields(r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)),
        if (r.isNullAt(4)) null else java.lang.Boolean.valueOf(r.getBoolean(4)),
        if (r.isNullAt(5)) null else java.lang.Long.valueOf(r.getLong(5)),
        r.getString(6), r.getString(7))
    }

  /** Top-level result values (AllValues, iterate.go). */
  def values(): Seq[QValue] =
    if (isPreResolved) preResolvedValues()
    else resolveCol(ID).flatten

  /** Values bound to one tag across all paths (TagEach). `keepEmpty`
    * substitutes `""` for rows without the tag (pathtest runTag).
    */
  def tagValues(tag: String, keepEmpty: Boolean = false): Seq[QValue] = {
    val c = tagCol(tag)
    val ic = Lower.intTagCol(tag)
    if (df.columns.contains(ic)) {
      // depth tags hold raw Long values, not dictionary ids
      df.select(col(ic)).collect().toSeq.map {
        case r if r.isNullAt(0) => QValue.Str("")
        case r                  => QValue.IntV(r.getLong(0))
      } match {
        case vs if keepEmpty => vs
        case vs => vs.filterNot(_ == QValue.Str(""))
      }
    } else if (!df.columns.contains(c)) {
      if (keepEmpty) Seq.fill(df.count().toInt)(QValue.Str("")) else Nil
    } else {
      val vs = resolveCol(c)
      if (keepEmpty) vs.map(_.getOrElse(QValue.Str(""))) else vs.flatten
    }
  }

  /** All tag bindings per path row (TagEach with all tags). All columns
    * resolve in ONE job — per-column jobs would observe different row
    * orders and scramble tag bindings across rows.
    */
  def tagMaps(includeTopLevel: Boolean = false): Seq[Map[String, QValue]] = {
    // (physical column, display name, holds raw Long value?)
    val cols = (if (includeTopLevel) Seq((ID, ID, false)) else Nil) ++
      Lower.tagCols(df).map(c => (c, Lower.decodeTag(c), Lower.isIntTagCol(c)))
    var cur = df
    val outCols = cols.zipWithIndex.map { case ((c, _, isInt), idx) =>
      if (isInt) c
      else {
        val a = s"__rc$idx"
        val dict = g.nodes.select(col("id").as(s"${a}_id"),
          struct(col("kind"), col("s"), col("i"), col("d"), col("b"), col("t"),
            col("lang"), col("dt")).as(s"${a}_v"))
        cur = cur.alias(s"${a}_l")
          .join(dict.alias(s"${a}_r"),
            col(s"${a}_l.$c") === col(s"${a}_r.${a}_id"), "left")
          .drop(s"${a}_id")
        s"${a}_v"
      }
    }
    val rows = cur.select(outCols.map(col): _*).collect()
    rows.toSeq.map { r =>
      cols.zipWithIndex.flatMap { case ((_, name, isInt), idx) =>
        if (r.isNullAt(idx)) None
        else if (isInt) Some(name -> QValue.IntV(r.getLong(idx)))
        else {
          val v = r.getStruct(idx)
          Some(name -> QValue.fromFields(v.getInt(0), v.getString(1),
            if (v.isNullAt(2)) null else java.lang.Long.valueOf(v.getLong(2)),
            if (v.isNullAt(3)) null else java.lang.Double.valueOf(v.getDouble(3)),
            if (v.isNullAt(4)) null else java.lang.Boolean.valueOf(v.getBoolean(4)),
            if (v.isNullAt(5)) null else java.lang.Long.valueOf(v.getLong(5)),
            v.getString(6), v.getString(7)))
        }
      }.toMap
    }
  }

  def count(): Long = df.count()

  /** Distributed finals: resolve id-valued columns to their scalar payload
    * (strings for IRI/BNode/text kinds, decimal string for numerics, ISO
    * for time) and return a DataFrame — used by Verify/Bench where results
    * must not be collected to the driver. `mapping` = (column in the
    * working set → output name); the working-set column may be `id` or a
    * tag column (pass the raw tag name via `Lower.tagCol`).
    */
  def payloadDF(mapping: (String, String)*): DataFrame = {
    import graft.core.Kind
    val strKinds = Seq(Kind.Iri, Kind.BNode, Kind.Str, Kind.LangStr,
      Kind.TypedStr).map(Integer.valueOf)
    def payload(kind: Column, s: Column, i: Column, d: Column, b: Column,
                t: Column): Column =
      when(kind.isin(strKinds: _*), s)
        .when(kind === Kind.IntK, i.cast("string"))
        .when(kind === Kind.FloatK, d.cast("string"))
        .when(kind === Kind.BoolK, b.cast("string"))
        .when(kind === Kind.TimeK,
          date_format((t.cast("double") / 1000000.0d).cast("timestamp"),
            "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"))
    var cur = df
    mapping.zipWithIndex.foreach { case ((c, out), idx) =>
      if (Lower.isIntTagCol(c)) {
        cur = cur.withColumn(out, col(c).cast("string"))
      } else {
        val a = s"__pay$idx"
        val dict = g.nodes.select(col("id").as(s"${a}_id"),
          payload(col("kind"), col("s"), col("i"), col("d"), col("b"),
            col("t")).as(out))
        cur = cur.alias(s"${a}_l")
          .join(dict.alias(s"${a}_r"),
            col(s"${a}_l.$c") === col(s"${a}_r.${a}_id"), "left")
          .drop(s"${a}_id")
      }
    }
    cur.select(mapping.map { case (_, out) => col(out) }: _*)
  }
}

/** Query execution entry: Path/Shape → optimized Shape → DataFrame. */
object Exec {
  def lower(g: Graph, s: Shape): DataFrame = new Lower(g)(s)
  def run(g: Graph, p: Path): Results = new Results(g, lower(g, p.shape()))
  def run(g: Graph, s: Shape): Results = new Results(g, lower(g, s))
}
